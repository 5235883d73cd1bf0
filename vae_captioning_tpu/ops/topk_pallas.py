"""Pallas TPU kernel: fused row-wise top-K + logsumexp.

The beam-search hot op.  Profiling (see ops/decoding.py) showed
``jax.lax.top_k`` over the vocab axis costs ~16 ms/step at
[512·beam, 11.5k] — 94% of decode time — and pairing it with a separate
``logsumexp`` makes XLA rematerialize the logits matmul per extraction
pass.  This kernel reads each logits row from HBM **once** into VMEM and
does everything there:

  * running max + exp-sum for the exact logsumexp,
  * K unrolled max/argmax/mask passes for the exact top-K
    (K = beam size ≤ 16, so K VMEM passes beat any sort).

Outputs are (values [N, K], indices [N, K], lse [N, 1]); beam search then
normalizes only the K winners: ``logp = value − lse``, which is exactly
``log_softmax(logits)`` at those positions.

Row blocking: 8 rows per grid step (f32 sublane tile), vocab padded to a
lane multiple by the caller wrapper with -inf.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8          # f32 sublane tile
_LANE = 128


def _kernel(x_ref, vals_ref, idx_ref, lse_ref, *, k: int, v_real: int):
    x = x_ref[:]                                       # [R, Vpad] VMEM
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    neg = jnp.float32(-jnp.inf)
    x = jnp.where(iota < v_real, x, neg)               # mask lane padding

    # exact logsumexp in one VMEM pass
    m = jnp.max(x, axis=-1, keepdims=True)             # [R, 1]
    s = jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True)
    lse_ref[:] = m + jnp.log(s)                        # [R, 1]

    # K unrolled extraction passes, all in VMEM
    work = x
    big = jnp.int32(x.shape[-1])
    for j in range(k):
        v = jnp.max(work, axis=-1, keepdims=True)      # [R, 1]
        is_max = work == v
        idx = jnp.min(jnp.where(is_max, iota, big), axis=-1,
                      keepdims=True)                   # first argmax (tie rule)
        vals_ref[:, j:j + 1] = v
        idx_ref[:, j:j + 1] = idx
        work = jnp.where(iota == idx, neg, work)


@functools.partial(jax.jit, static_argnames=("k",))
def top_k_logsumexp_pallas(x: jax.Array, k: int
                           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: [N, V] f32 → (values [N, k], indices [N, k] i32, lse [N]).

    N must be a multiple of 8 (the caller's batch·beam always is in
    practice; wrapper pads otherwise).  V is padded to a lane multiple
    internally.
    """
    N, V = x.shape
    v_pad = (-V) % _LANE
    if v_pad:
        x = jnp.pad(x, ((0, 0), (0, v_pad)), constant_values=-jnp.inf)
    n_pad = (-N) % _ROWS
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)), constant_values=0.0)
    Np, Vp = x.shape

    grid = (Np // _ROWS,)
    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, k=k, v_real=V),
        grid=grid,
        in_specs=[pl.BlockSpec((_ROWS, Vp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((_ROWS, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, k), jnp.float32),
            jax.ShapeDtypeStruct((Np, k), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=Np * Vp * (k + 2), bytes_accessed=Np * Vp * 4,
            transcendentals=Np * Vp),
    )(x)
    return vals[:N], idx[:N], lse[:N, 0]


def top_k_logsumexp_xla(x: jax.Array, k: int
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reference implementation (CPU / correctness baseline)."""
    vals, idx = jax.lax.top_k(x, k)
    lse = jax.scipy.special.logsumexp(x, axis=-1)
    return vals, idx, lse


def top_k_logsumexp(x: jax.Array, k: int, use_pallas: bool = None
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dispatch: Pallas kernel on TPU, XLA elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # via the dp shard_map wrapper: rows split over a >1-device
        # mesh, single-device passthrough otherwise
        from vae_captioning_tpu.parallel.kernel_shard import topk_lse
        return topk_lse(x, k)
    return top_k_logsumexp_xla(x, k)
