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


from timing_util import marginal_ms  # noqa: E402 (shared two-point slope helper)
from vae_captioning_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()


def main() -> None:
    from vae_captioning_tpu.ops.fused_ce import (fused_linear_ce,
                                                 fused_linear_ce_hybrid,
                                                 fused_linear_ce_xla)

    impls = {"fused": fused_linear_ce, "hybrid": fused_linear_ce_hybrid,
             "xla": fused_linear_ce_xla}
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, nargs="+",
                   default=[7680, 15360, 30720, 61440])
    p.add_argument("--impls", nargs="+", default=list(impls),
                   choices=list(impls))
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

        for name in args.impls:
            op = impls[name]
            # grads wrt h, w, b — what the train step needs
            import functools

            @functools.partial(jax.jit, static_argnames=("steps",))
            def run(h, w, b, steps, op=op):
                def body(carry, _):
                    hh, ww = carry
                    loss, (dh, dw, db) = jax.value_and_grad(
                        lambda a, c, d: op(a, c, d, labels, weights),
                        argnums=(0, 1, 2))(hh, ww, b)
                    return (hh - 1e-9 * dh, ww - 1e-9 * dw), loss
                _, losses = jax.lax.scan(body, (h, w), None, length=steps)
                return losses[-1]

            ms, _ = marginal_ms(lambda n: run(h, w, b, n), n_lo=4, n_hi=16)
            print(json.dumps({
                "impl": name, "rows": M, "H": H, "V": V,
                "marginal_ms": round(ms, 2),
                "rows_per_sec": round(M / (ms / 1e3), 0),
            }))


if __name__ == "__main__":
    main()
