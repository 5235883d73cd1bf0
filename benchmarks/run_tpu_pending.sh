#!/bin/bash
# Round-4 relay-gated validations — run when the axon relay is back.
# (The relay was down for the entire round-4 session; every stage below
# is CPU-validated and waiting for real-TPU numbers.)  Stages are
# independent; each logs to $LOGDIR/.
set -x
# resolve before cd so a relative invocation still lands in the repo;
# logs live IN the repo so the end-of-round commit preserves any TPU
# numbers captured by the recovery watcher even if nobody reads /tmp
LOGDIR="$(cd "$(dirname "$0")" && pwd)/tpu_r4_logs"
cd "$(dirname "$0")/.."
mkdir -p "$LOGDIR"

# 0. device sanity (relay up?)
timeout 300 python -c "import jax; print(jax.devices())" \
  > $LOGDIR/devices.log 2>&1 || { echo RELAY_DOWN; exit 1; }

# 1. headline bench (progressive emission; watchdog exits 0 w/ best line)
VCT_BENCH_BUDGET_S=900 timeout 1000 python bench.py \
  > $LOGDIR/bench.log 2> $LOGDIR/bench.err

# 2. beam-10 extraction A/B (int32-key sweeps vs bitonic running-merge
#    vs exact threshold tile-skip; --peaked = trained-logit profile)
timeout 1800 python benchmarks/bench_topk_variants.py --peaked --k 10 \
  > $LOGDIR/topk_ab_peaked.log 2>&1
timeout 1800 python benchmarks/bench_topk_variants.py --k 10 \
  > $LOGDIR/topk_ab_iid.log 2>&1

# 3. train-step tail A/B (q_heads single-dense + Config.optax_flatten)
timeout 1800 python benchmarks/bench_device.py \
  --components train_flatten_ab train_step \
  > $LOGDIR/device.log 2>&1

# 4. COCO-stats corpus run on TPU (CPU insurance numbers in PERF.md)
timeout 3600 python examples/synthetic_train_demo.py \
  --coco_stats --images 20000 --steps 1500 \
  > $LOGDIR/coco_stats_tpu.log 2>&1

echo ALL_DONE
