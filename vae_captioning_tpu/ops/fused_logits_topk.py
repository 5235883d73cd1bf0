"""Pallas TPU kernel: fused  (h @ W + b) → top-K + logsumexp.

One level beyond ops/topk_pallas.py: the decode step's logits are never
materialized in HBM at all.  The kernel tiles the vocab dimension,
computes each logits tile on the MXU, and folds it into per-row running
state (online-softmax max/sum + a running top-K list) held in VMEM
scratch.  Per decode step this replaces

    logits = h @ W + b          # [M, V] → 2·M·V·4 bytes of HBM traffic
    vals, idx, lse = topk_lse(logits)   # + M·V·4 read

with HBM traffic of just  h (re-read per vocab tile) + W + b + outputs —
at M = 24k, V = 11.5k that is ~2.3 GB → ~40 MB per step.

Grid: (vocab_tiles, row_blocks) with the vocab dimension OUTER so the
weight tile is fetched once per sweep; running state is scratch sized
[M_padded, ·] indexed by the row block.

Numerics: bf16 matmul with fp32 accumulation; exact logsumexp via the
online max/sum recurrence; exact top-K by per-tile extraction (K ≤ 16
unrolled max/argmax/mask passes in VMEM) merged into the running list.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 256     # rows per block


def _vocab_tile(k: int) -> int:
    """Vocab tile width (multiple of 128).  Larger k needs more VMEM for
    the extraction loop's working copies, so shrink the tile."""
    return 3840 if k <= 4 else 1920
_NEG = -1e30  # plain float: jnp scalars can't be captured by the kernel


def _kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref,
            rv_scratch, ri_scratch, ms_scratch,
            *, k: int, v_real: int, bv: int):
    # Running state is stored TRANSPOSED — [k, Mp] / [2, Mp] — so the
    # lane (128-wide) dimension spans rows and the scratch costs
    # ~k·Mp·4 bytes instead of Mp·128·4 per array (which OOMs VMEM).
    j = pl.program_id(0)          # vocab tile (outer)
    i = pl.program_id(1)          # row block (inner)
    n_v = pl.num_programs(0)
    BM = h_ref.shape[0]
    cols = pl.ds(i * BM, BM)

    @pl.when(j == 0)
    def _init():
        rv_scratch[:, cols] = jnp.full((k, BM), _NEG)
        ri_scratch[:, cols] = jnp.zeros((k, BM), jnp.int32)
        ms_scratch[0:1, cols] = jnp.full((1, BM), _NEG)   # running max
        ms_scratch[1:2, cols] = jnp.zeros((1, BM))        # running exp-sum

    # ---- logits tile on the MXU (bf16 × bf16 → f32)
    tile = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + j * bv
    tile = jnp.where(col < v_real, tile, _NEG)       # mask vocab padding

    # ---- tile top-K (K unrolled extraction passes, all in VMEM)
    # (A two-level variant — per-128-lane group maxima → top-K groups →
    # masked slice gather — was built and measured SLOWER: 0.186 vs
    # 0.135 ms/step per extraction pass at M=6144; the 30-iteration
    # masked gather generates worse VPU code than these long sweeps.)
    work = tile
    t_vals = []
    t_idx = []
    for _ in range(k):
        v = jnp.max(work, axis=-1, keepdims=True)     # [BM, 1]
        is_max = work == v
        idx = jnp.min(jnp.where(is_max, col, jnp.int32(2**30)),
                      axis=-1, keepdims=True)
        t_vals.append(v)
        t_idx.append(idx)
        work = jnp.where(col == idx, _NEG, work)
    tile_vals = jnp.concatenate(t_vals, axis=-1)      # [BM, k]
    tile_idx = jnp.concatenate(t_idx, axis=-1)

    # ---- online logsumexp (tile max = the first extraction pass's max
    # — saves one full-tile reduce)
    m_old = ms_scratch[0:1, cols].T                   # [BM, 1]
    s_old = ms_scratch[1:2, cols].T
    tile_max = t_vals[0]
    m_new = jnp.maximum(m_old, tile_max)
    s_new = (s_old * jnp.exp(m_old - m_new)
             + jnp.sum(jnp.exp(tile - m_new), axis=-1, keepdims=True))
    ms_scratch[0:1, cols] = m_new.T
    ms_scratch[1:2, cols] = s_new.T

    # ---- merge into the running top-K (select k best of 2k)
    cat_v = jnp.concatenate([rv_scratch[:, cols].T, tile_vals], axis=-1)
    cat_i = jnp.concatenate([ri_scratch[:, cols].T, tile_idx], axis=-1)
    # tie-break: earlier vocab index wins (matches lax.top_k / the
    # reference's first-argmax rule)
    sel_v = []
    sel_i = []
    for _ in range(k):
        v = jnp.max(cat_v, axis=-1, keepdims=True)
        is_max = cat_v == v
        idx = jnp.min(jnp.where(is_max, cat_i, jnp.int32(2**30)),
                      axis=-1, keepdims=True)
        sel_v.append(v)
        sel_i.append(idx)
        cat_v = jnp.where(jnp.logical_and(cat_v == v, cat_i == idx),
                          _NEG, cat_v)
    rv_scratch[:, cols] = jnp.concatenate(sel_v, axis=-1).T
    ri_scratch[:, cols] = jnp.concatenate(sel_i, axis=-1).T

    # ---- final vocab tile: publish outputs
    @pl.when(j == n_v - 1)
    def _publish():
        vals_ref[:, :] = rv_scratch[:, cols].T
        idx_ref[:, :] = ri_scratch[:, cols].T
        lse_ref[:, :] = (ms_scratch[0:1, cols]
                         + jnp.log(ms_scratch[1:2, cols])).T


@functools.partial(jax.jit, static_argnames=("k",))
def fused_logits_top_k(h: jax.Array, w: jax.Array, b: jax.Array, k: int
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """h: [M, H] (any float dtype), w: [H, V], b: [V] →
    (top-k values [M, k] f32 — bias included, un-normalized logits;
     indices [M, k] i32; logsumexp [M] f32)."""
    M, H = h.shape
    V = w.shape[1]
    bv = _vocab_tile(k)
    h16 = h.astype(jnp.bfloat16)
    w16 = w.astype(jnp.bfloat16)
    v_pad = (-V) % bv
    if v_pad:
        w16 = jnp.pad(w16, ((0, 0), (0, v_pad)))
        b = jnp.pad(b, (0, v_pad))
    m_pad = (-M) % _BM
    if m_pad:
        h16 = jnp.pad(h16, ((0, m_pad), (0, 0)))
    Mp = h16.shape[0]
    Vp = w16.shape[1]
    n_v, n_m = Vp // bv, Mp // _BM

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, k=k, v_real=V, bv=bv),
        grid=(n_v, n_m),
        in_specs=[
            pl.BlockSpec((_BM, H), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BM, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, k), jnp.float32),
            jax.ShapeDtypeStruct((Mp, k), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, Mp), jnp.float32),   # running top-k values (T)
            pltpu.VMEM((k, Mp), jnp.int32),     # running top-k indices (T)
            pltpu.VMEM((2, Mp), jnp.float32),   # running max / exp-sum (T)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * H * Vp + Mp * Vp * (k + 2),
            bytes_accessed=(Mp * H * 2 * n_v + H * Vp * 2 + Mp * k * 8),
            transcendentals=Mp * Vp),
    )(h16, w16, b.astype(jnp.float32).reshape(1, -1))
    return vals[:M], idx[:M], lse[:M, 0]


def _sample_kernel(seed_ref, h_ref, w_ref, b_ref, tok_ref, rm_scratch,
                   ri_scratch, *, v_real: int, bv: int, inv_temp: float):
    """Gumbel-max categorical sampling fused with the logits matmul:
    argmax_v(logits_v / T + G_v) ~ Categorical(softmax(logits / T)).
    Running (max, argmax) merged across vocab tiles like the top-K
    kernel; per-(tile, block) PRNG streams keep noise iid."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    BM = h_ref.shape[0]
    cols = pl.ds(i * BM, BM)

    @pl.when(j == 0)
    def _init():
        rm_scratch[0:1, cols] = jnp.full((1, BM), _NEG)
        ri_scratch[0:1, cols] = jnp.zeros((1, BM), jnp.int32)

    tile = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + j * bv

    # one independent stream per (tile, block); Mosaic allows ≤2 seed values
    pltpu.prng_seed(seed_ref[0], j * pl.num_programs(1) + i)
    bits = pltpu.prng_random_bits(tile.shape)
    # uniform in (0, 1): keep 23 bits so the int32→f32 cast is exact
    # (Mosaic has no uint32→f32 cast)
    u = (pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 9, jnp.int32)
         .astype(jnp.float32)) / (2.0**23)
    u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
    gumbel = -jnp.log(-jnp.log(u))
    scored = tile * inv_temp + gumbel
    scored = jnp.where(col < v_real, scored, _NEG)

    m_old = rm_scratch[0:1, cols].T
    tile_max = jnp.max(scored, axis=-1, keepdims=True)
    is_max = scored == tile_max
    tile_arg = jnp.min(jnp.where(is_max, col, jnp.int32(2**30)),
                       axis=-1, keepdims=True)
    better = tile_max > m_old
    rm_scratch[0:1, cols] = jnp.where(better, tile_max, m_old).T
    i_old = ri_scratch[0:1, cols].T
    ri_scratch[0:1, cols] = jnp.where(better, tile_arg, i_old).T

    @pl.when(j == pl.num_programs(0) - 1)
    def _publish():
        tok_ref[:, :] = ri_scratch[0:1, cols].T


@functools.partial(jax.jit, static_argnames=("temperature",))
def fused_logits_sample(h: jax.Array, w: jax.Array, b: jax.Array,
                        seed: jax.Array, temperature: float = 1.0
                        ) -> jax.Array:
    """One fused categorical draw per row: tokens [M] int32 sampled from
    softmax((h @ w + b) / temperature).  ``seed``: int32 scalar."""
    M, H = h.shape
    V = w.shape[1]
    bv = _vocab_tile(1)
    h16 = h.astype(jnp.bfloat16)
    w16 = w.astype(jnp.bfloat16)
    v_pad = (-V) % bv
    if v_pad:
        w16 = jnp.pad(w16, ((0, 0), (0, v_pad)))
        b = jnp.pad(b, (0, v_pad))
    m_pad = (-M) % _BM
    if m_pad:
        h16 = jnp.pad(h16, ((0, m_pad), (0, 0)))
    Mp, Vp = h16.shape[0], w16.shape[1]

    tokens = pl.pallas_call(
        functools.partial(_sample_kernel, v_real=V, bv=bv,
                          inv_temp=1.0 / temperature),
        grid=(Vp // bv, Mp // _BM),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BM, H), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, Mp), jnp.float32),   # running max (T)
            pltpu.VMEM((1, Mp), jnp.int32),     # running argmax (T)
        ],
    )(seed.reshape(1).astype(jnp.int32), h16, w16,
      b.astype(jnp.float32).reshape(1, -1))
    return tokens[:M, 0]


def fused_logits_top_k_xla(h, w, b, k):
    """Reference implementation (CPU / correctness tests) — same bf16
    matmul precision as the kernel so results compare exactly."""
    logits = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b.astype(jnp.float32)[None, :]
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return vals, idx, lse
