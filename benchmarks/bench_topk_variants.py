"""A/B bench for top-K *extraction* strategies inside the fused
logits+top-K kernel (VERDICT r2 #3: the K unrolled extraction passes in
ops/fused_logits_topk.py dominate the beam-10 decode step).

Each variant is the SAME kernel skeleton (vocab-tiled MXU matmul +
online-lse + running top-K merge, transposed scratch) with only the
per-tile extraction loop swapped:

  current      — the production loop: max / eq / min-where(col) / mask
  argmax       — lax.argmax for the index (first-max tie-break is the
                 same rule), mask via col == idx
  packed_exact — extraction runs on the order-isomorphic int32 key
                 (f32 bits with the negative half xor-flipped); value
                 recovered exactly from the key, same tie-break ops
  packed_quant — APPROXIMATE datapoint: index packed into the key's low
                 12 bits (value quantized to 11 mantissa bits for
                 ordering) → single max-reduce + masked clear per pass,
                 3 tile-ops instead of 6.  NOT exact — measures the
                 ceiling of the packed approach.

Run ON TPU:  python benchmarks/bench_topk_variants.py [--m 20480] [--k 10]
Prints one JSON line per variant: marginal ms/step + max |Δval| and
index agreement vs the XLA reference.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timing_util import marginal_ms  # noqa: E402
from vae_captioning_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

from vae_captioning_tpu.ops.fused_logits_topk import (  # noqa: E402
    _BM, _NEG, _VMEM_LIMIT, fused_logits_top_k_xla)

_IMIN = -2**31 + 1


def _sortable(bits):
    """f32 bits (as int32) -> order-isomorphic int32 (involution)."""
    return bits ^ ((bits >> 31) & 0x7FFFFFFF)


def _extract_current(tile, col, k):
    work = tile
    t_vals, t_idx = [], []
    for _ in range(k):
        v = jnp.max(work, axis=-1, keepdims=True)
        is_max = work == v
        idx = jnp.min(jnp.where(is_max, col, jnp.int32(2**30)),
                      axis=-1, keepdims=True)
        t_vals.append(v)
        t_idx.append(idx)
        work = jnp.where(col == idx, _NEG, work)
    return jnp.concatenate(t_vals, -1), jnp.concatenate(t_idx, -1)


def _extract_argmax(tile, col, k):
    work = tile
    base = col[0:1, 0:1]  # j * bv broadcastable
    t_vals, t_idx = [], []
    for _ in range(k):
        v = jnp.max(work, axis=-1, keepdims=True)
        am = jnp.argmax(work, axis=-1).astype(jnp.int32)[:, None]
        idx = am + base
        t_vals.append(v)
        t_idx.append(idx)
        work = jnp.where(col == idx, _NEG, work)
    return jnp.concatenate(t_vals, -1), jnp.concatenate(t_idx, -1)


def _extract_packed_exact(tile, col, k):
    s = _sortable(pltpu.bitcast(tile, jnp.int32))
    t_vals, t_idx = [], []
    for _ in range(k):
        m = jnp.max(s, axis=-1, keepdims=True)
        idx = jnp.min(jnp.where(s == m, col, jnp.int32(2**30)),
                      axis=-1, keepdims=True)
        t_vals.append(pltpu.bitcast(_sortable(m), jnp.float32))
        t_idx.append(idx)
        s = jnp.where(col == idx, _IMIN, s)
    return jnp.concatenate(t_vals, -1), jnp.concatenate(t_idx, -1)


def _extract_packed_quant(tile, col, k):
    # key = value bits (low 12 cleared) | (4095 - local col): unique per
    # lane, larger value wins, ties -> earlier col.  APPROXIMATE.
    local = col - col[0:1, 0:1]
    s = _sortable(pltpu.bitcast(tile, jnp.int32))
    p = (s & ~jnp.int32(0xFFF)) | (jnp.int32(4095) - local)
    base = col[0:1, 0:1]
    t_vals, t_idx = [], []
    for _ in range(k):
        m = jnp.max(p, axis=-1, keepdims=True)
        t_vals.append(pltpu.bitcast(_sortable(m & ~jnp.int32(0xFFF)),
                                    jnp.float32))
        t_idx.append(jnp.int32(4095) - (m & jnp.int32(0xFFF)) + base)
        p = jnp.where(p == m, _IMIN, p)
    return jnp.concatenate(t_vals, -1), jnp.concatenate(t_idx, -1)


def _extract_trivial(tile, col, k):
    """Decomposition baseline: broadcast the first column k-wide (no
    extraction passes).  WRONG results — cost-accounting only.  (A
    ``tile[:, :k]`` lane-slice crashed Mosaic at k=10; width-1 slice +
    broadcast is the safe pattern.)"""
    BM = tile.shape[0]
    return (jnp.zeros((BM, k), tile.dtype) + tile[:, 0:1],
            jnp.zeros((BM, k), jnp.int32) + col[:, 0:1])


_EXTRACTORS = {
    "current": _extract_current,
    "argmax": _extract_argmax,
    "packed_exact": _extract_packed_exact,
    "packed_quant": _extract_packed_quant,
    # round-4 candidates (VERDICT r3 #5):
    "bitonic_merge": _extract_packed_exact,   # merge swapped, see below
    "threshold_skip": _extract_packed_exact,  # tile-skip, see _kernel
    # decomposition modes (results intentionally wrong; see --decompose):
    "base_only": _extract_trivial,       # matmul + stores
    "lse_only": _extract_trivial,        # + online lse
    "extract_only": _extract_packed_exact,  # + extraction passes
    "merge_only": _extract_trivial,      # + running top-K merge
    # real extraction+merge without the online-lse (isolates lse cost;
    # the trivial modes above can crash Mosaic's lowering via DCE)
    "packed_exact_nolse": _extract_packed_exact,
}

# mode -> (do_lse, do_merge)
_MODE_PARTS = {
    "base_only": (False, False),
    "lse_only": (True, False),
    "extract_only": (False, False),
    "merge_only": (False, True),
    "packed_exact_nolse": (False, True),
}


def _cmp_desc(va, ia, vb, ib):
    """(value desc, index asc) ordering — the production tie-break."""
    a_wins = jnp.logical_or(va > vb, jnp.logical_and(va == vb, ia < ib))
    return (jnp.where(a_wins, va, vb), jnp.where(a_wins, ia, ib),
            jnp.where(a_wins, vb, va), jnp.where(a_wins, ib, ia))


def _reverse_pow2(x, n):
    """Reverse the last axis (length n, a power of 2) WITHOUT lax.rev.

    Mosaic has no lowering for the ``rev`` primitive — ``bv[:, ::-1]``
    crashed on real TPU in round 4 (tpu_r4_logs/topk_ab_peaked.log:
    "Unimplemented primitive in Pallas TPU lowering: rev").  Since
    n-1 is all-ones, index i -> n-1-i flips EVERY bit of i, and
    flipping bit b == swapping the two halves of each 2^(b+1)-sized
    block: one static reshape+stack per bit, the same pattern the
    merge stages below already use."""
    BM = x.shape[0]
    d = 1
    while d < n:
        x4 = x.reshape(BM, n // (2 * d), 2, d)
        x = jnp.stack([x4[:, :, 1, :], x4[:, :, 0, :]],
                      axis=2).reshape(BM, n)
        d *= 2
    return x


def _bitonic_merge_sorted(av, ai, bv, bi, k):
    """Top-k of two length-k DESC-sorted (value, index) lists via a
    bitonic merge network — log2(2k') compare-exchange stages instead of
    the k max/argmin/kill passes (NEXT r3 item 4's named idea).

    Both lists are padded to k' = next pow2; b is reversed so a++rev(b)
    is bitonic; each stage partners lanes at XOR distance d via
    reshape-flip (static shapes only).  Exact and tie-break-identical:
    compare is (value desc, index asc)."""
    kp = 1 << (k - 1).bit_length()
    pad = kp - k
    if pad:
        av = jnp.concatenate(
            [av, jnp.full((av.shape[0], pad), _NEG, av.dtype)], axis=-1)
        ai = jnp.concatenate(
            [ai, jnp.full((ai.shape[0], pad), 2**30, jnp.int32)], axis=-1)
        bv = jnp.concatenate(
            [bv, jnp.full((bv.shape[0], pad), _NEG, bv.dtype)], axis=-1)
        bi = jnp.concatenate(
            [bi, jnp.full((bi.shape[0], pad), 2**30, jnp.int32)], axis=-1)
    # a ++ reverse(b): descending then ascending = bitonic
    v = jnp.concatenate([av, _reverse_pow2(bv, kp)], axis=-1)  # [BM, 2k']
    ix = jnp.concatenate([ai, _reverse_pow2(bi, kp)], axis=-1)
    n = 2 * kp
    d = kp
    while d >= 1:
        BM = v.shape[0]
        v4 = v.reshape(BM, n // (2 * d), 2, d)
        i4 = ix.reshape(BM, n // (2 * d), 2, d)
        hv, hi, lv, li = _cmp_desc(v4[:, :, 0, :], i4[:, :, 0, :],
                                   v4[:, :, 1, :], i4[:, :, 1, :])
        v = jnp.stack([hv, lv], axis=2).reshape(BM, n)
        ix = jnp.stack([hi, li], axis=2).reshape(BM, n)
        d //= 2
    return v[:, :k], ix[:, :k]


def _kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref,
            rv_scratch, ri_scratch, ms_scratch,
            *, k, v_real, bv, mode):
    j = pl.program_id(0)
    i = pl.program_id(1)
    BM = h_ref.shape[0]
    n_v = pl.num_programs(0)
    cols = pl.ds(i * BM, BM)

    @pl.when(j == 0)
    def _init():
        rv_scratch[:, cols] = jnp.full((k, BM), _NEG)
        ri_scratch[:, cols] = jnp.zeros((k, BM), jnp.int32)
        ms_scratch[0:1, cols] = jnp.full((1, BM), _NEG)
        ms_scratch[1:2, cols] = jnp.zeros((1, BM))

    tile = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + j * bv
    tile = jnp.where(col < v_real, tile, _NEG)

    if mode == "threshold_skip":
        # Exact tile-skip (VERDICT r3 #5): a tile whose GLOBAL max is
        # strictly below every row's current k-th value cannot change
        # any row's top-k — skip extraction AND merge for it (the lse
        # fold still runs: its per-row max comes from a standalone
        # reduce here, not extraction pass 1).  Vocab ids are frequency
        # -sorted, so a trained model's mass sits in the FIRST tiles and
        # later tiles skip; random logits never skip (worst case =
        # current + 2 reduces).  Ties are safe: equality falls through
        # to the full path.
        m_tile = jnp.max(tile, axis=-1, keepdims=True)      # [BM, 1]
        m_old = ms_scratch[0:1, cols].T
        s_old = ms_scratch[1:2, cols].T
        m_new = jnp.maximum(m_old, m_tile)
        s_new = (s_old * jnp.exp(m_old - m_new)
                 + jnp.sum(jnp.exp(tile - m_new), axis=-1, keepdims=True))
        ms_scratch[0:1, cols] = m_new.T
        ms_scratch[1:2, cols] = s_new.T
        tau_min = jnp.min(rv_scratch[k - 1:k, cols])        # weakest row
        live = jnp.logical_or(j == 0, jnp.max(m_tile) >= tau_min)

        @pl.when(live)
        def _extract_merge():
            tile_vals, tile_idx = _extract_packed_exact(tile, col, k)
            cat_v = jnp.concatenate([rv_scratch[:, cols].T, tile_vals],
                                    axis=-1)
            cat_i = jnp.concatenate([ri_scratch[:, cols].T, tile_idx],
                                    axis=-1)
            sel_v, sel_i = [], []
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
    else:
        tile_vals, tile_idx = _EXTRACTORS[mode](tile, col, k)
        do_lse, do_merge = _MODE_PARTS.get(mode, (True, True))

        if do_lse:
            m_old = ms_scratch[0:1, cols].T
            s_old = ms_scratch[1:2, cols].T
            tile_max = tile_vals[:, 0:1]
            m_new = jnp.maximum(m_old, tile_max)
            s_new = (s_old * jnp.exp(m_old - m_new)
                     + jnp.sum(jnp.exp(tile - m_new), axis=-1,
                               keepdims=True))
            ms_scratch[0:1, cols] = m_new.T
            ms_scratch[1:2, cols] = s_new.T

        if do_merge and mode == "bitonic_merge":
            mv, mi = _bitonic_merge_sorted(
                rv_scratch[:, cols].T, ri_scratch[:, cols].T,
                tile_vals, tile_idx, k)
            rv_scratch[:, cols] = mv.T
            ri_scratch[:, cols] = mi.T
        elif do_merge:
            cat_v = jnp.concatenate([rv_scratch[:, cols].T, tile_vals],
                                    axis=-1)
            cat_i = jnp.concatenate([ri_scratch[:, cols].T, tile_idx],
                                    axis=-1)
            sel_v, sel_i = [], []
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
        else:
            rv_scratch[:, cols] = tile_vals[:, :k].T
            ri_scratch[:, cols] = tile_idx[:, :k].T

    @pl.when(j == n_v - 1)
    def _publish():
        vals_ref[:, :] = rv_scratch[:, cols].T
        idx_ref[:, :] = ri_scratch[:, cols].T
        lse_ref[:, :] = (ms_scratch[0:1, cols]
                         + jnp.log(ms_scratch[1:2, cols])).T


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def fused_topk_variant(h, w, b, k, mode):
    M, H = h.shape
    V = w.shape[1]
    bv = 1920
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
    n_v, n_m = Vp // bv, Mp // _BM

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, k=k, v_real=V, bv=bv, mode=mode),
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
            pltpu.VMEM((k, Mp), jnp.float32),
            pltpu.VMEM((k, Mp), jnp.int32),
            pltpu.VMEM((2, Mp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(h16, w16, b.astype(jnp.float32).reshape(1, -1))
    return vals[:M], idx[:M], lse[:M, 0]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=20480)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--variants", nargs="*", default=list(_EXTRACTORS))
    p.add_argument("--peaked", action="store_true",
                   help="trained-model logit profile: probability mass "
                        "concentrated on LOW vocab ids (the Vocabulary is "
                        "frequency-sorted), the regime threshold_skip "
                        "targets; default is iid-random logits (its worst "
                        "case)")
    args = p.parse_args(argv)

    H, V = 512, 11500
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(args.m, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.01)
    if args.peaked:
        # ~Zipf logit offsets by vocab rank: top-k land in the first
        # vocab tiles for every row, as with a trained frequency-sorted
        # vocabulary (bench.py --trained shows the same structure)
        b = b + jnp.asarray(8.0 / np.sqrt(1.0 + np.arange(V)), jnp.float32)

    # correctness snapshot vs the XLA reference (same bf16 matmul)
    want_v, want_i, want_lse = map(np.asarray,
                                   fused_logits_top_k_xla(h0, w, b, args.k))

    failures = 0
    for mode in args.variants:
        # one broken variant must not abort the sweep (round-4 lesson:
        # the bitonic_merge Mosaic crash truncated BOTH A/B logs and left
        # threshold_skip untimed — VERDICT r4 weak #2)
        try:
            got_v, got_i, got_lse = map(
                np.asarray, fused_topk_variant(h0, w, b, args.k, mode))
            idx_agree = float((got_i == want_i).mean())
            dval = float(np.abs(got_v - want_v).max())
            dlse = float(np.abs(got_lse - want_lse).max())

            def run(n, mode=mode):
                def body(carry, _):
                    h = carry
                    vals, idx, lse = fused_topk_variant(h, w, b, args.k,
                                                        mode)
                    return h + vals[:, 0:1] * 1e-9, None
                out, _ = jax.lax.scan(body, h0, None, length=n)
                return out[:4, :4]

            runner = jax.jit(run, static_argnums=0)
            ms, _ = marginal_ms(runner, n_lo=8, n_hi=32, reps=5)
            print(json.dumps({
                "variant": mode, "k": args.k, "M": args.m,
                "marginal_ms_per_step": round(ms, 4),
                "idx_agreement": round(idx_agree, 6),
                "max_abs_dval": dval, "max_abs_dlse": round(dlse, 6),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(json.dumps({
                "variant": mode, "k": args.k, "M": args.m,
                "error": f"{type(e).__name__}: {e}"[:400],
            }), flush=True)
    return failures


if __name__ == "__main__":
    main()
