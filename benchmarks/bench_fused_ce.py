"""fused_ce vs XLA loss+grad timing at multiple shapes (VERDICT r1 #5).

Measures value_and_grad of the masked linear-CE loss — the exact
sub-computation ``compute_loss`` routes through ``Config.fused_ce`` —
for the Pallas fused kernel vs the XLA reference at growing row counts
(rows = B·K·T; the reference recipe's fine-tune regime is ~38k rows at
bs 256×5×30).  Prints one JSON line per (impl, shape).

Run ON TPU (the fused path is TPU-only):

    python benchmarks/bench_fused_ce.py [--rows 7680 15360 30720 61440]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H = 512
V = 11500


def time_fn(fn, args, iters=7):
    # axon relay: fetch to host each iteration or timings are fake
    outs = fn(*args)
    np.asarray(jax.tree.leaves(outs)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = fn(*args)
        np.asarray(jax.tree.leaves(outs)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    from vae_captioning_tpu.ops.fused_ce import (fused_linear_ce,
                                                 fused_linear_ce_xla)

    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, nargs="+",
                   default=[7680, 15360, 30720, 61440])
    p.add_argument("--iters", type=int, default=7)
    args = p.parse_args()

    for M in args.rows:
        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.02)
        b = jnp.zeros((V,), jnp.float32)
        labels = jnp.asarray(rng.integers(0, V, M).astype(np.int32))
        mask = (rng.random(M) > 0.2).astype(np.float32)
        weights = jnp.asarray(mask / mask.sum())

        for name, op in (("fused", fused_linear_ce),
                         ("xla", fused_linear_ce_xla)):
            # grads wrt h, w, b — what the train step needs
            fn = jax.jit(jax.value_and_grad(
                lambda hh, ww, bb: op(hh, ww, bb, labels, weights),
                argnums=(0, 1, 2)))
            dt = time_fn(fn, (h, w, b), args.iters)
            print(json.dumps({
                "impl": name, "rows": M, "H": H, "V": V,
                "ms": round(dt * 1e3, 2),
                "rows_per_sec": round(M / dt, 0),
            }))


if __name__ == "__main__":
    main()
