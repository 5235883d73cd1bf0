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
online max/sum recurrence; exact top-K by per-tile extraction — K
unrolled max/tie-break/mask passes in VMEM over the order-isomorphic
int32 keys of the f32 tile (see ``_sortable``; ~1.6× the f32 sweeps,
bit-identical results) — merged into the running list.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 256     # rows per block (large-batch decode)


def _row_block(m: int) -> int:
    """Rows per block: 256 for throughput shapes, 128 for small-batch
    serving (batch 1-8 × beam requests would otherwise pad the VPU
    extraction sweeps to 256 rows).  128 is the floor: the transposed
    running-state scratch ([k, Mp]) is sliced along the LANE dimension
    per row block, and Mosaic requires those offsets/extents to be
    128-lane aligned (32 was tried — 'cannot statically prove that
    index in dimension 1 is a multiple of 128')."""
    return _BM if m > 128 else 128


def _vocab_tile(k: int) -> int:
    """Vocab tile width (multiple of 128).  Larger k needs more VMEM for
    the extraction loop's working copies, so shrink the tile.  (2944 was
    tried when a surrounding program pushed the kernel 4% over the
    DEFAULT 16 MB scoped-VMEM limit — it measured 47% slower from the
    extra per-tile overheads; the right fix is raising the limit, see
    _VMEM_LIMIT.)"""
    return 3840 if k <= 4 else 1920


# The default scoped-VMEM limit is 16 MiB and the k≤4 configuration
# (double-buffered [H, 3840] weight tile + f32 tile + extraction work
# copies) sits right at it — some surrounding programs tip it a few
# percent over and fail to compile.  The running-state scratch also
# scales with TOTAL rows (k·Mp·4×2 + 2·Mp·4): at M=24576 (batch-8192
# beam-3 decode) 17 MiB tips over by ~112 KB ("stack oom" at compile).
# 32 MiB covers every shape we run and measures at parity with both the
# unlimited default and 17 MiB (0.857 vs 0.842 ms/step at M=6144 k=3;
# the limit VALUE is not speed-sensitive — it only caps what Mosaic may
# co-schedule, it does not reserve memory).
_VMEM_LIMIT = 32 * 1024 * 1024
_NEG = -1e30  # plain float: jnp scalars can't be captured by the kernel
_IMIN = -2**31 + 1


def _sortable(bits):
    """f32 bits (as int32) → order-isomorphic int32 key (involution).

    Non-negative floats are already int32-ordered by their bits; the
    negative half orders backwards, so xor its non-sign bits.  Extraction
    passes run on these keys: int32 max/compare/select generate ~1.6×
    faster VPU code than the mixed f32/int sweeps they replace (A/B at
    M=20480 k=10: 11.0 → 6.8 ms/step, benchmarks/bench_topk_variants.py)
    and the exact f32 value is recovered by the inverse transform — the
    selection, tie-breaks, and values are bit-identical.

    Known edge (ADVICE r3, measure-zero for logits): the key maps -0.0
    to -1 and +0.0 to 0, so when a row's k-th value is exactly 0.0 and
    the row contains BOTH +0.0 and -0.0 there, the packed (k>4) path
    tie-breaks to the earliest +0.0 column while the f32 (k<=4) path
    tie-breaks across both signs — a k-dependent index choice between
    equal values.  Canonicalizing zeros would add a VPU where-pass to a
    schedule-sensitive sweep for an input real logits never produce
    (exact ±0.0 collisions at the k-boundary); documented instead."""
    return bits ^ ((bits >> 31) & 0x7FFFFFFF)


def _fold_tile(tile_fn, BM, j, i, vals_ref, idx_ref, lse_ref,
               rv_scratch, ri_scratch, ms_scratch,
               *, k: int, v_real: int, bv: int):
    """Init running state, compute one logits tile (``tile_fn``), fold it
    into the running top-K + online-lse state, publish on the last vocab
    tile — shared by the bf16 and int8 kernels.

    ``tile_fn`` is called AFTER the j==0 scratch init: initializing
    after the matmul (an earlier refactor) kept the tile live across the
    init stores — Mosaic's schedule regressed 34% and scoped VMEM grew
    past the 16 MB default limit.

    Running state is stored TRANSPOSED — [k, Mp] / [2, Mp] — so the
    lane (128-wide) dimension spans rows and the scratch costs
    ~k·Mp·4 bytes instead of Mp·128·4 per array (which OOMs VMEM)."""
    n_v = pl.num_programs(0)
    cols = pl.ds(i * BM, BM)

    @pl.when(j == 0)
    def _init():
        rv_scratch[:, cols] = jnp.full((k, BM), _NEG)
        ri_scratch[:, cols] = jnp.zeros((k, BM), jnp.int32)
        ms_scratch[0:1, cols] = jnp.full((1, BM), _NEG)   # running max
        ms_scratch[1:2, cols] = jnp.zeros((1, BM))        # running exp-sum

    tile = tile_fn()
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + j * bv
    tile = jnp.where(col < v_real, tile, _NEG)       # mask vocab padding

    # ---- tile top-K (K unrolled extraction passes, all in VMEM).
    # Two domains, both exact with identical tie-breaks, picked by k
    # (same-process A/B at reference shapes, see _sortable):
    #   k ≤ 4 — f32 sweeps (packing costs more than 3-4 passes save:
    #           0.88 → 0.98 ms/step at k=3, M=6144)
    #   k ≥ 5 — order-isomorphic int32 keys (11.0 → 6.9 ms/step at
    #           k=10, M=20480; the one-time pack amortizes)
    # (A two-level variant — per-128-lane group maxima → top-K groups →
    # masked slice gather — was built and measured SLOWER: 0.186 vs
    # 0.135 ms/step per extraction pass at M=6144; the 30-iteration
    # masked gather generates worse VPU code.)
    packed = k > 4
    work = _sortable(pltpu.bitcast(tile, jnp.int32)) if packed else tile
    dead = _IMIN if packed else _NEG
    t_keys = []
    t_idx = []
    for _ in range(k):
        m = jnp.max(work, axis=-1, keepdims=True)     # [BM, 1]
        is_max = work == m
        idx = jnp.min(jnp.where(is_max, col, jnp.int32(2**30)),
                      axis=-1, keepdims=True)
        t_keys.append(m)
        t_idx.append(idx)
        work = jnp.where(col == idx, dead, work)
    cat = jnp.concatenate(t_keys, axis=-1)            # [BM, k]
    tile_vals = (pltpu.bitcast(_sortable(cat), jnp.float32) if packed
                 else cat)
    tile_idx = jnp.concatenate(t_idx, axis=-1)

    # ---- online logsumexp (tile max = the first extraction pass's max
    # — saves one full-tile reduce)
    m_old = ms_scratch[0:1, cols].T                   # [BM, 1]
    s_old = ms_scratch[1:2, cols].T
    tile_max = tile_vals[:, 0:1]
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


def _kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref,
            rv_scratch, ri_scratch, ms_scratch,
            *, k: int, v_real: int, bv: int):
    j = pl.program_id(0)          # vocab tile (outer)
    i = pl.program_id(1)          # row block (inner)

    def tile_fn():
        # ---- logits tile on the MXU (bf16 × bf16 → f32)
        return jax.lax.dot_general(
            h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_ref[0, :][None, :]

    _fold_tile(tile_fn, h_ref.shape[0], j, i, vals_ref, idx_ref, lse_ref,
               rv_scratch, ri_scratch, ms_scratch,
               k=k, v_real=v_real, bv=bv)


def _kernel_int8(hq_ref, hs_ref, wq_ref, ws_ref, b_ref,
                 vals_ref, idx_ref, lse_ref,
                 rv_scratch, ri_scratch, ms_scratch,
                 *, k: int, v_real: int, bv: int):
    j = pl.program_id(0)
    i = pl.program_id(1)

    def tile_fn():
        # ---- int8 MXU tile (2× bf16 on v5e): int8 × int8 → i32,
        # dequantized by per-row (activation) / per-column (weight) scales
        acc = jax.lax.dot_general(
            hq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * hs_ref[:, 0:1]
                * ws_ref[0, :][None, :] + b_ref[0, :][None, :])

    _fold_tile(tile_fn, hq_ref.shape[0], j, i, vals_ref, idx_ref, lse_ref,
               rv_scratch, ri_scratch, ms_scratch,
               k=k, v_real=v_real, bv=bv)


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
    bm = _row_block(M)
    m_pad = (-M) % bm
    if m_pad:
        h16 = jnp.pad(h16, ((0, m_pad), (0, 0)))
    Mp = h16.shape[0]
    Vp = w16.shape[1]
    n_v, n_m = Vp // bv, Mp // bm

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, k=k, v_real=V, bv=bv),
        grid=(n_v, n_m),
        in_specs=[
            pl.BlockSpec((bm, H), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(h16, w16, b.astype(jnp.float32).reshape(1, -1))
    return vals[:M], idx[:M], lse[:M, 0]


def quantize_logits_weights(w: jax.Array
                            ) -> Tuple[jax.Array, jax.Array]:
    """Per-output-column symmetric int8 quantization of the logits head:
    wq[i, j] = round(w[i, j] / ws[j]), ws[j] = max_i |w[i, j]| / 127.
    Computed ONCE per decode-fn build (Config.decode_int8)."""
    ws = jnp.max(jnp.abs(w), axis=0) / 127.0
    ws = jnp.maximum(ws, 1e-12)
    wq = jnp.clip(jnp.round(w / ws[None, :]), -127, 127).astype(jnp.int8)
    return wq, ws.astype(jnp.float32)


def _quantize_rows(h: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-row symmetric int8 quantization of the activations."""
    hs = jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0
    hs = jnp.maximum(hs, 1e-12)
    hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    return hq, hs.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def fused_logits_top_k_int8(h: jax.Array, wq: jax.Array, ws: jax.Array,
                            b: jax.Array, k: int
                            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantized variant of ``fused_logits_top_k``: int8 MXU matmul (2×
    bf16 throughput on v5e), dequantized per tile, same exact top-K +
    online-lse folding.  APPROXIMATE — top-K selection can differ from
    the bf16 path where logit margins are below the ~1% quantization
    error (Config.decode_int8, default off; agreement measured in
    tests/test_fused_logits_topk.py and PERF.md).

    ``wq``/``ws`` come from ``quantize_logits_weights``; ``h`` is
    quantized per row on the fly."""
    M, H = h.shape
    V = wq.shape[1]
    bv = max(_vocab_tile(k), 128 * k)
    hq, hs = _quantize_rows(h.astype(jnp.float32))
    v_pad = (-V) % bv
    if v_pad:
        wq = jnp.pad(wq, ((0, 0), (0, v_pad)))
        ws = jnp.pad(ws, (0, v_pad))
        b = jnp.pad(b, (0, v_pad))
    bm = _row_block(M)
    m_pad = (-M) % bm
    if m_pad:
        hq = jnp.pad(hq, ((0, m_pad), (0, 0)))
        hs = jnp.pad(hs, ((0, m_pad), (0, 0)))
    Mp = hq.shape[0]
    Vp = wq.shape[1]
    n_v, n_m = Vp // bv, Mp // bm

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel_int8, k=k, v_real=V, bv=bv),
        grid=(n_v, n_m),
        in_specs=[
            pl.BlockSpec((bm, H), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, k), jnp.float32),
            jax.ShapeDtypeStruct((Mp, k), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, Mp), jnp.float32),
            pltpu.VMEM((k, Mp), jnp.int32),
            pltpu.VMEM((2, Mp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * H * Vp + Mp * Vp * (k + 2),
            bytes_accessed=(Mp * H * n_v + H * Vp + Mp * k * 8),
            transcendentals=Mp * Vp),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(hq, hs, wq, ws.reshape(1, -1),
      b.astype(jnp.float32).reshape(1, -1))
    return vals[:M], idx[:M], lse[:M, 0]


def fused_logits_top_k_int8_xla(h, wq, ws, b, k):
    """Reference implementation with identical quantized math."""
    hq, hs = _quantize_rows(h.astype(jnp.float32))
    acc = jax.lax.dot_general(
        hq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    logits = acc.astype(jnp.float32) * hs * ws[None, :] + b[None, :]
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return vals, idx, lse


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
    bm = _row_block(M)
    m_pad = (-M) % bm
    if m_pad:
        h16 = jnp.pad(h16, ((0, m_pad), (0, 0)))
    Mp, Vp = h16.shape[0], w16.shape[1]

    tokens = pl.pallas_call(
        functools.partial(_sample_kernel, v_real=V, bv=bv,
                          inv_temp=1.0 / temperature),
        grid=(Vp // bv, Mp // bm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, H), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, Mp), jnp.float32),   # running max (T)
            pltpu.VMEM((1, Mp), jnp.int32),     # running argmax (T)
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
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
