"""Data layer (SURVEY.md §1 L1, §2.1).

Datasets: MNIST, FashionMNIST (28×28×1), CIFAR-10, SVHN (32×32×3).
Real files are looked for under ``$APV_DATA_DIR`` (default ``/root/data``) in
their standard distribution formats; when absent (this build environment has
no network and no dataset files — SURVEY.md §7 risk R1), a deterministic
synthetic dataset with matching shapes/dtypes is generated so every pipeline
runs end-to-end.
"""

from apv_tpu.data.datasets import load_dataset, DATASETS  # noqa: F401
from apv_tpu.data.preprocess import (  # noqa: F401
    static_binarize, uniform_dequantize, to_unit_interval)
from apv_tpu.data.pipeline import (  # noqa: F401
    Batcher, prefetch_to_device, stack_batches)
