"""Infrastructure utilities (SURVEY.md §2.6, §5): config, checkpoint, logging."""

from apv_tpu.utils.config import Config, get_preset, PRESETS, apply_overrides  # noqa: F401
