#!/bin/bash
# Round-3 session-5 TPU queue (one TPU process at a time — CLAUDE.md).
# The VM reboot wiped results/ checkpoints; this chain re-materializes the
# evidence tree, runs the two queued gates, and re-runs the 1600k scaling
# run that was in flight when session 4 ended. Phases are independent
# enough to continue past a failure (each sub-script is set -e); the
# driver polls the log.
cd "$(dirname "$0")/.."
set -x

run() {  # run "phase name" cmd...
  local name="$1"; shift
  echo "=== PHASE START: $name ($(date -u +%H:%M:%S)) ==="
  if "$@"; then
    echo "=== PHASE OK: $name ($(date -u +%H:%M:%S)) ==="
  else
    echo "=== PHASE FAILED: $name ($(date -u +%H:%M:%S)) ==="
  fi
}

# 1. Flagship 100k retrain + headline eval (k=1000, 512 examples).
run flagship_train apv train --preset cifar_advprior_resnet --overwrite
run flagship_eval apv evaluate --preset iwae_eval --set eval.max_examples=512

# 2. Full evidence tree: MNIST/fashion/SVHN models + both-direction OOD.
run evidence bash scripts/evidence_refresh_r3.sh

# 3. Queued trained-flow-prior quality gate.
run flow_gate bash scripts/flow_prior_gate.sh

# 4. Re-materialize the 800k headline checkpoint (0.7283 bits/dim — the
#    MALA/ex-post A/B rows reference it) + the queued ex-post prior
#    measurement batch on it. The 1600k extension does not fit this
#    session's remaining wall clock after the cold-compile overhead
#    (~50 min per production graph with the compile cache wiped).
run scale_800k bash scripts/scale_800k.sh
run gmm_followup bash scripts/gmm_followup.sh cifar_800k

echo "session5 queue complete ($(date -u +%H:%M:%S))"
