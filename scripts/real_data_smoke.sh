#!/usr/bin/env bash
# Real-data drill (SURVEY.md §7 R1, VERDICT r1 item 9).
#
# When real datasets appear under $APV_DATA_DIR (standard MNIST idx /
# CIFAR-10 pickle / SVHN .mat files), this script trains configs 1-3
# briefly, evaluates NLL + bits/dim, runs the OOD suite, and sanity-checks
# bits/dim against the BASELINE.md literature anchors. Without
# $APV_DATA_DIR it exercises the identical pipeline on the deterministic
# synthetic fallback (anchor checks are skipped — synthetic NLLs are not
# comparable; SURVEY.md §6).
#
# Usage:
#   APV_DATA_DIR=/path/to/datasets scripts/real_data_smoke.sh [results_dir]
#   scripts/real_data_smoke.sh                  # synthetic fallback drill
#
# Env knobs: SMOKE_STEPS (default 300), SMOKE_EVAL_K (default 100),
# SMOKE_PLATFORM (tpu|cpu — cpu avoids contending for the single chip).

set -euo pipefail

RESULTS="${1:-/tmp/apv_smoke_$$}"
STEPS="${SMOKE_STEPS:-300}"
EVAL_K="${SMOKE_EVAL_K:-100}"
DATA_ARGS=()
if [[ -n "${APV_DATA_DIR:-}" ]]; then
  DATA_ARGS=(--set "data.data_dir=${APV_DATA_DIR}")
  echo "== real data from ${APV_DATA_DIR} =="
else
  echo "== no APV_DATA_DIR: synthetic-fallback drill (anchors skipped) =="
fi

run() { echo "+ apv $*"; apv "$@"; }

# steps_per_call=1: smoke step counts aren't multiples of the MNIST
# presets' production dispatch stride (8)
common=(--set "results_dir=${RESULTS}" --set "train.steps=${STEPS}"
        --set "train.eval_every=$((STEPS / 3))"
        --set "train.checkpoint_every=${STEPS}"
        --set "train.steps_per_call=1" "${DATA_ARGS[@]}")
if [[ -n "${SMOKE_PLATFORM:-}" ]]; then
  common+=(--platform "${SMOKE_PLATFORM}")
fi
# extra dot-path overrides, e.g. SMOKE_EXTRA_SETS="model.z_dim=8 model.widths=[8,16]"
for kv in ${SMOKE_EXTRA_SETS:-}; do common+=(--set "$kv"); done

# config 1: plain conv VAE, binarized MNIST
run train --preset mnist_vae "${common[@]}"
run evaluate --preset mnist_vae --k "${EVAL_K}" "${common[@]}" \
    --set "eval.max_examples=512" | tee "${RESULTS}/smoke_eval_mnist.json"

# config 2: adversarial-prior MNIST
run train --preset mnist_advprior "${common[@]}"

# config 3: CIFAR ResNet + adversarial prior + disc-logistic
run train --preset cifar_advprior_resnet "${common[@]}"
run evaluate --preset cifar_advprior_resnet --k "${EVAL_K}" "${common[@]}" \
    --set "eval.max_examples=512" | tee "${RESULTS}/smoke_eval_cifar.json"

# config 5: OOD suites, both pair directions
run ood --preset mnist_advprior --both "${common[@]}" \
    --set "ood.in_dataset=mnist" --set "ood.ood_dataset=fashion_mnist" \
    --set "ood.iwae_k=20" --set "ood.max_examples=512" \
    | tee "${RESULTS}/smoke_ood_mnist.json"
run ood --preset cifar_advprior_resnet --both "${common[@]}" \
    --set "ood.iwae_k=20" --set "ood.max_examples=512" \
    | tee "${RESULTS}/smoke_ood_cifar.json"

# anchor sanity check (real data only): literature ranges from BASELINE.md.
# Short runs land well above converged anchors; the gate is a loose upper
# bound that catches data-pipeline breakage (wrong scaling/binarization
# shows up as wildly wrong bits/dim), not a convergence test.
if [[ -n "${APV_DATA_DIR:-}" ]]; then
  python - "$RESULTS" <<'EOF'
import json, re, sys
from pathlib import Path

results = Path(sys.argv[1])

def bpd(path):
    txt = path.read_text()
    return json.loads(txt[txt.index("{"):])["bits_per_dim"]

mnist = bpd(results / "smoke_eval_mnist.json")
cifar = bpd(results / "smoke_eval_cifar.json")
# anchors (BASELINE.md): MNIST ~0.155-0.16 converged; CIFAR ~3.5-4.5.
ok = 0.10 < mnist < 1.0 and 2.5 < cifar < 8.0
print(f"anchor check: mnist bits/dim={mnist:.3f} (converged ~0.16), "
      f"cifar bits/dim={cifar:.3f} (converged ~3.5-4.5) -> "
      f"{'OK' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
EOF
fi

echo "smoke drill complete: ${RESULTS}"
