#!/bin/bash
# Round-5 relay-gated validations (VERDICT r4 #4: highest-value-first
# ordering, tighter per-stage timeouts — round 4's serial `timeout 1800`
# stages starved stages 3-4 during the one relay window).  Stages are
# independent; each logs to $LOGDIR/ so a late relay recovery still
# lands its numbers in the end-of-round commit.
set -x
LOGDIR="$(cd "$(dirname "$0")" && pwd)/tpu_r5_logs"
cd "$(dirname "$0")/.."
mkdir -p "$LOGDIR"

# 0. device sanity (relay up?)
timeout 300 python -c "import jax; print(jax.devices())" \
  > $LOGDIR/devices.log 2>&1 || { echo RELAY_DOWN; exit 1; }

# 1. train-tail A/B (q_heads single-dense + Config.optax_flatten) —
#    round-4 stage 3 that never landed; q_heads shipped unconditionally
#    with zero TPU timing evidence (VERDICT r4 weak #3), so this is the
#    highest-value unique number.
timeout 900 python benchmarks/bench_device.py \
  --components train_flatten_ab train_step \
  > $LOGDIR/device.log 2>&1

# 2. headline bench (progressive emission; ADVICE-r4-fixed projection
#    should now reach the 1024 upgrade inside the budget)
VCT_BENCH_BUDGET_S=900 timeout 1000 python bench.py \
  > $LOGDIR/bench.log 2> $LOGDIR/bench.err

# 3. beam-10 extraction A/B — per-variant try/except now isolates any
#    Mosaic lowering failure (round-4 bitonic `rev` crash truncated both
#    logs); restricted to the 6 real candidates so both profiles fit.
VARIANTS="current argmax packed_exact packed_quant bitonic_merge threshold_skip"
timeout 1200 python benchmarks/bench_topk_variants.py --peaked --k 10 \
  --variants $VARIANTS > $LOGDIR/topk_ab_peaked.log 2>&1
timeout 1200 python benchmarks/bench_topk_variants.py --k 10 \
  --variants $VARIANTS > $LOGDIR/topk_ab_iid.log 2>&1

# 4. COCO-stats corpus run on TPU (CPU insurance numbers in PERF.md)
timeout 3600 python examples/synthetic_train_demo.py \
  --coco_stats --images 20000 --steps 1500 \
  > $LOGDIR/coco_stats_tpu.log 2>&1

echo ALL_DONE
