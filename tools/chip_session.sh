#!/bin/bash
# Round-3 TPU work queue — run as soon as the axon relay (:8083) is back.
# Each stage is a separate python process (one chip claim at a time);
# everything is timeout-bounded so a wedge can't eat the session.
# Usage: bash tools/chip_session.sh [outdir]
set -u
OUT=${1:-/tmp/chip_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

log() { echo "[chip_session $(date +%T)] $*"; }

log "stage 0: claim smoke (2 min cold claim budget)"
timeout 300 python -u -c "
import time; t0=time.time(); import jax
d = jax.devices(); print('claimed in %.1fs:' % (time.time()-t0), d, flush=True)
import jax.numpy as jnp
print('compute', float(jnp.sum(jnp.ones((8,128)))), flush=True)
" > "$OUT/claim.log" 2>&1
if [ $? -ne 0 ]; then log "claim FAILED — aborting (see $OUT/claim.log)"; exit 1; fi
log "claim ok"

log "stage 1: bench (full, deadline-guarded)"
BENCH_DEADLINE_S=540 timeout 700 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
log "bench rc=$? tail: $(tail -1 "$OUT/bench.json" 2>/dev/null | head -c 200)"

log "stage 2: box-stack tuning sweep"
timeout 1800 python tools/sweep_box.py > "$OUT/sweep_box.json" 2> "$OUT/sweep_box.log"
log "sweep rc=$? best: $(tail -1 "$OUT/sweep_box.json" 2>/dev/null)"

log "stage 2b: box stage profile (attribution for the next tuning round)"
timeout 600 python tools/profile_box.py > "$OUT/profile_box.log" 2>&1
log "profile rc=$? tail: $(tail -2 "$OUT/profile_box.log" | tr '\n' ' ')"

log "stage 3: walk training (gliding reference, curriculum)"
timeout 3600 python examples/train_locomotion.py \
    --iters 600 --num-envs 4096 --solver-mode fused \
    --walk-target 1.0 --curriculum-stages 4 \
    --ckpt-dir /tmp/walk_ckpt --csv "$OUT/walk_train.csv" \
    > "$OUT/walk_train.log" 2>&1
log "train rc=$?"

log "stage 4: walk eval"
timeout 900 python examples/eval_locomotion.py /tmp/walk_ckpt \
    --walk-target 1.0 > "$OUT/walk_eval.log" 2>&1
log "eval rc=$? tail: $(tail -3 "$OUT/walk_eval.log" | tr '\n' ' ')"

log "done — results in $OUT"
