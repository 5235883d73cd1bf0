"""Pallas TPU kernels: memory-efficient fused linear cross-entropy.

The training loss materializes ``[B·K·T, V]`` logits forward AND backward
(at batch 256×5 captions×24 steps × 11.5k vocab that is ~1.4 GB × 3 of
HBM traffic per step).  This module computes

    loss = Σ_i weights_i · ( logsumexp(h_i @ W + b) − (h_i @ W + b)[y_i] )

and its gradients without ever writing the logits to HBM:

  * forward: one kernel — vocab-tiled MXU matmul folded into an online
    logsumexp + the label logit pick.
  * backward: two kernels that recompute logits tiles on the fly
    (flash-attention-style):  dh = (p − onehot)·gw @ Wᵀ  with rows outer
    so the [BM, H] accumulator lives in VMEM, and  dW/db = hᵀ @ (p −
    onehot)·gw  with vocab outer so the [H, BV] accumulator lives in
    VMEM.

Exact: matches the XLA reference (same bf16 matmul precision) to float
tolerance; validated by grad-vs-autodiff tests.  Exposed behind
``Config.fused_ce`` (opt-in) and used by the train step on TPU.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 256
_BV = 1280
_NEG = -1e30


def _pad_all(h, w, b, labels, weights):
    M, H = h.shape
    V = w.shape[1]
    h16 = h.astype(jnp.bfloat16)
    w16 = w.astype(jnp.bfloat16)
    v_pad = (-V) % _BV
    if v_pad:
        w16 = jnp.pad(w16, ((0, 0), (0, v_pad)))
        b = jnp.pad(b, (0, v_pad))
    m_pad = (-M) % _BM
    if m_pad:
        h16 = jnp.pad(h16, ((0, m_pad), (0, 0)))
        labels = jnp.pad(labels, (0, m_pad), constant_values=-1)
        weights = jnp.pad(weights, (0, m_pad))
    return (h16, w16, b.astype(jnp.float32), labels.astype(jnp.int32),
            weights.astype(jnp.float32), M, V)


# ----------------------------------------------------------------------
# forward: lse + label logit
# ----------------------------------------------------------------------

def _fwd_kernel(h_ref, w_ref, b_ref, lab_ref, lse_ref, ll_ref,
                ms_scratch, ll_scratch, *, v_real: int, bv: int):
    j = pl.program_id(0)   # vocab tile (outer)
    i = pl.program_id(1)   # row block (inner)
    BM = h_ref.shape[0]
    cols = pl.ds(i * BM, BM)

    @pl.when(j == 0)
    def _init():
        ms_scratch[0:1, cols] = jnp.full((1, BM), _NEG)
        ms_scratch[1:2, cols] = jnp.zeros((1, BM))
        ll_scratch[0:1, cols] = jnp.zeros((1, BM))

    tile = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + j * bv
    tile = jnp.where(col < v_real, tile, _NEG)

    m_old = ms_scratch[0:1, cols].T
    s_old = ms_scratch[1:2, cols].T
    tile_max = jnp.max(tile, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_old, tile_max)
    s_new = (s_old * jnp.exp(m_old - m_new)
             + jnp.sum(jnp.exp(tile - m_new), axis=-1, keepdims=True))
    ms_scratch[0:1, cols] = m_new.T
    ms_scratch[1:2, cols] = s_new.T

    lab = lab_ref[:, 0:1]                                  # [BM, 1]
    hit = jnp.sum(jnp.where(col == lab, tile, 0.0), axis=-1,
                  keepdims=True)                           # [BM, 1]
    ll_scratch[0:1, cols] = (ll_scratch[0:1, cols].T + hit).T

    @pl.when(j == pl.num_programs(0) - 1)
    def _publish():
        lse_ref[:, :] = (ms_scratch[0:1, cols]
                         + jnp.log(ms_scratch[1:2, cols])).T
        ll_ref[:, :] = ll_scratch[0:1, cols].T


def _fwd_pallas(h16, w16, b, labels, Mp, Vp, V):
    return pl.pallas_call(
        functools.partial(_fwd_kernel, v_real=V, bv=_BV),
        grid=(Vp // _BV, Mp // _BM),
        in_specs=[
            pl.BlockSpec((_BM, h16.shape[1]), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h16.shape[1], _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Mp), jnp.float32),
            pltpu.VMEM((1, Mp), jnp.float32),
        ],
    )(h16, w16, b.reshape(1, -1), labels.reshape(-1, 1))


# ----------------------------------------------------------------------
# backward kernels (logits recomputed per tile)
# ----------------------------------------------------------------------

def _dh_kernel(h_ref, w_ref, b_ref, lab_ref, lse_ref, gw_ref, dh_ref,
               acc, *, v_real: int, bv: int):
    i = pl.program_id(0)   # row block (OUTER here)
    j = pl.program_id(1)   # vocab tile (inner)

    @pl.when(j == 0)
    def _init():
        acc[:, :] = jnp.zeros_like(acc)

    tile = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + j * bv
    p = jnp.where(col < v_real, jnp.exp(tile - lse_ref[:, 0:1]), 0.0)
    dl = (p - (col == lab_ref[:, 0:1]).astype(jnp.float32)) * gw_ref[:, 0:1]
    # dh += dl @ W_tileᵀ : contract the vocab dim of both
    acc[:, :] += jax.lax.dot_general(
        dl.astype(jnp.bfloat16), w_ref[:],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _publish():
        dh_ref[:, :] = acc[:, :]


def _dwdb_kernel(h_ref, w_ref, b_ref, lab_ref, lse_ref, gw_ref,
                 dw_ref, db_ref, dw_acc, db_acc, *, v_real: int, bv: int):
    j = pl.program_id(0)   # vocab tile (OUTER here)
    i = pl.program_id(1)   # row block (inner)

    @pl.when(i == 0)
    def _init():
        dw_acc[:, :] = jnp.zeros_like(dw_acc)
        db_acc[:, :] = jnp.zeros_like(db_acc)

    tile = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + j * bv
    p = jnp.where(col < v_real, jnp.exp(tile - lse_ref[:, 0:1]), 0.0)
    dl = (p - (col == lab_ref[:, 0:1]).astype(jnp.float32)) * gw_ref[:, 0:1]
    # dW_tile += h_blockᵀ @ dl : contract the row dim of both
    dw_acc[:, :] += jax.lax.dot_general(
        h_ref[:], dl.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db_acc[:, :] += jnp.sum(dl, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(1) - 1)
    def _publish():
        dw_ref[:, :] = dw_acc[:, :]
        db_ref[:, :] = db_acc[:, :]


# ----------------------------------------------------------------------
# public op with custom VJP
# ----------------------------------------------------------------------

@jax.custom_vjp
def fused_linear_ce(h: jax.Array, w: jax.Array, b: jax.Array,
                    labels: jax.Array, weights: jax.Array) -> jax.Array:
    """Σ_i weights_i · CE(softmax(h_i @ w + b), labels_i) — scalar.

    Set ``weights = mask / Σmask`` for the reference's PAD-masked mean
    CE (main.py:152-158).  labels: int32 [M]; rows with weight 0 are
    free to carry any label."""
    loss, _ = _fwd(h, w, b, labels, weights)
    return loss


def _fwd(h, w, b, labels, weights):
    h16, w16, bf, lab, wt, M, V = _pad_all(h, w, b, labels, weights)
    Mp, Vp = h16.shape[0], w16.shape[1]
    lse, ll = _fwd_pallas(h16, w16, bf, lab, Mp, Vp, V)
    loss = jnp.sum(wt[:M] * (lse[:M, 0] - ll[:M, 0]))
    return loss, (h, w, b, labels, weights, lse, ll)


def _bwd(res, g):
    h, w, b, labels, weights, lse, ll = res
    h16, w16, bf, lab, wt, M, V = _pad_all(h, w, b, labels, weights)
    Mp, Vp = h16.shape[0], w16.shape[1]
    H = h16.shape[1]
    gw = (g * wt).reshape(-1, 1)

    dh = pl.pallas_call(
        functools.partial(_dh_kernel, v_real=V, bv=_BV),
        grid=(Mp // _BM, Vp // _BV),          # rows OUTER
        in_specs=[
            pl.BlockSpec((_BM, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _BV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, H), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BM, H), jnp.float32)],
    )(h16, w16, bf.reshape(1, -1), lab.reshape(-1, 1), lse, gw)

    dw, db = pl.pallas_call(
        functools.partial(_dwdb_kernel, v_real=V, bv=_BV),
        grid=(Vp // _BV, Mp // _BM),          # vocab OUTER
        in_specs=[
            pl.BlockSpec((_BM, H), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((H, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H, _BV), jnp.float32),
            pltpu.VMEM((1, _BV), jnp.float32),
        ],
    )(h16, w16, bf.reshape(1, -1), lab.reshape(-1, 1), lse, gw)

    M_real = h.shape[0]
    # loss is linear in weights: d loss / d weights_i = g · (lse_i − ll_i)
    dweights = (g * (lse[:M_real, 0] - ll[:M_real, 0])).astype(weights.dtype)
    return (dh[:M_real].astype(h.dtype),
            dw[:, :V].astype(w.dtype),
            db[0, :V].astype(b.dtype),
            None, dweights)


fused_linear_ce.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
# hybrid variant: logits ARE materialized (bf16), but every reduction
# that XLA runs as its own full-[M, V] HBM pass is fused away
# ----------------------------------------------------------------------
#
# The round-3 train-step trace showed XLA's CE at ~95% of roofline but
# structured as FIVE full passes over the [M, V] logits: fwd matmul +
# write (1.9 ms at reference shapes), a separate max/sumexp read
# (1.03), dW (1.93), dh (2.02), and a separate db read (0.94).  The
# flash kernel above avoids the logits write entirely but pays the
# matmul THREE times (fwd + both backward recomputes) — a net loss at
# V = 11.5k (PERF.md).  This hybrid takes the third option: write the
# bf16 logits once, fold lse + the label logit into the forward matmul
# pass, and fold db into the dW pass; dh stays a plain jnp expression
# (XLA fuses the softmax recompute into the matmul at roofline).
# Net: 5 passes → 3.


def _fwd_mat_kernel(h_ref, w_ref, b_ref, lab_ref,
                    lg_ref, lse_ref, ll_ref,
                    ms_scratch, ll_scratch, *, v_real: int, bv: int):
    j = pl.program_id(0)   # vocab tile (outer)
    i = pl.program_id(1)   # row block (inner)
    BM = h_ref.shape[0]
    cols = pl.ds(i * BM, BM)

    @pl.when(j == 0)
    def _init():
        ms_scratch[0:1, cols] = jnp.full((1, BM), _NEG)
        ms_scratch[1:2, cols] = jnp.zeros((1, BM))
        ll_scratch[0:1, cols] = jnp.zeros((1, BM))

    tile = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + j * bv
    tile = jnp.where(col < v_real, tile, _NEG)
    # bf16 residual; pad cols hold _NEG → exp(·−lse) = 0 in the backward
    lg_ref[:, :] = tile.astype(lg_ref.dtype)

    m_old = ms_scratch[0:1, cols].T
    s_old = ms_scratch[1:2, cols].T
    tile_max = jnp.max(tile, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_old, tile_max)
    s_new = (s_old * jnp.exp(m_old - m_new)
             + jnp.sum(jnp.exp(tile - m_new), axis=-1, keepdims=True))
    ms_scratch[0:1, cols] = m_new.T
    ms_scratch[1:2, cols] = s_new.T

    lab = lab_ref[:, 0:1]
    hit = jnp.sum(jnp.where(col == lab, tile, 0.0), axis=-1, keepdims=True)
    ll_scratch[0:1, cols] = (ll_scratch[0:1, cols].T + hit).T

    @pl.when(j == pl.num_programs(0) - 1)
    def _publish():
        lse_ref[:, :] = (ms_scratch[0:1, cols]
                         + jnp.log(ms_scratch[1:2, cols])).T
        ll_ref[:, :] = ll_scratch[0:1, cols].T


def _dwdb_mat_kernel(h_ref, lg_ref, lab_ref, lse_ref, gw_ref,
                     dw_ref, db_ref, *, v_real: int, bv: int):
    """dW/db from the MATERIALIZED logits (no recompute matmul).  The
    revisited output blocks are the accumulators — vocab outer keeps
    their revisits consecutive."""
    j = pl.program_id(0)   # vocab tile (OUTER)
    i = pl.program_id(1)   # row block (inner)

    @pl.when(i == 0)
    def _init():
        dw_ref[:, :] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[:, :] = jnp.zeros(db_ref.shape, db_ref.dtype)

    col = (jax.lax.broadcasted_iota(jnp.int32, lg_ref.shape, 1) + j * bv)
    p = jnp.exp(lg_ref[:, :].astype(jnp.float32) - lse_ref[:, 0:1])
    dl = (p - (col == lab_ref[:, 0:1]).astype(jnp.float32)) * gw_ref[:, 0:1]
    dw_ref[:, :] += jax.lax.dot_general(
        h_ref[:], dl.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db_ref[:, :] += jnp.sum(dl, axis=0, keepdims=True)


_BMD = 512  # dh row block: fewer W re-reads than 256 (60 vs 120 sweeps
            # at reference rows) while keeping VMEM ≈ 8 MB.  2048 was
            # A/B'd on TPU in round 5 (fewer W sweeps in theory) and
            # measured 1.4 ms SLOWER in-train — the larger working set
            # breaks the DMA/compute overlap; don't retry without a
            # profiler trace
_VMEM_LIMIT_DH = 100 * 1024 * 1024


def _dh_mat_kernel(lg_ref, w_ref, lab_ref, lse_ref, gw_ref, dh_ref,
                   acc, *, bv: int):
    """dh from the MATERIALIZED logits: dl computed in-register (XLA
    would write the [M, V] dl16 to HBM as its own pass — elementwise
    producers do not fuse into dot operands)."""
    i = pl.program_id(0)   # row block (OUTER)
    j = pl.program_id(1)   # vocab tile (inner)

    @pl.when(j == 0)
    def _init():
        acc[:, :] = jnp.zeros_like(acc)

    col = jax.lax.broadcasted_iota(jnp.int32, lg_ref.shape, 1) + j * bv
    p = jnp.exp(lg_ref[:, :].astype(jnp.float32) - lse_ref[:, 0:1])
    dl = (p - (col == lab_ref[:, 0:1]).astype(jnp.float32)) * gw_ref[:, 0:1]
    acc[:, :] += jax.lax.dot_general(
        dl.astype(jnp.bfloat16), w_ref[:],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _publish():
        dh_ref[:, :] = acc[:, :]


@jax.custom_vjp
def fused_linear_ce_hybrid(h: jax.Array, w: jax.Array, b: jax.Array,
                           labels: jax.Array, weights: jax.Array
                           ) -> jax.Array:
    """Same contract as ``fused_linear_ce`` (Σ weights·CE), hybrid
    schedule: bf16 logits written once, reductions fused (see above)."""
    loss, _ = _fwd_mat(h, w, b, labels, weights)
    return loss


def _fwd_mat(h, w, b, labels, weights):
    h16, w16, bf, lab, wt, M, V = _pad_all(h, w, b, labels, weights)
    Mp, Vp = h16.shape[0], w16.shape[1]
    H = h16.shape[1]
    lg, lse, ll = pl.pallas_call(
        functools.partial(_fwd_mat_kernel, v_real=V, bv=_BV),
        grid=(Vp // _BV, Mp // _BM),
        in_specs=[
            pl.BlockSpec((_BM, H), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BM, _BV), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, Vp), jnp.bfloat16),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Mp), jnp.float32),
            pltpu.VMEM((1, Mp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * H * Vp,
            bytes_accessed=(Mp * H * 2 * (Vp // _BV) + H * Vp * 2
                            + Mp * Vp * 2),
            transcendentals=2 * Mp * Vp),
    )(h16, w16, bf.reshape(1, -1), lab.reshape(-1, 1))
    loss = jnp.sum(wt[:M] * (lse[:M, 0] - ll[:M, 0]))
    return loss, (h, w, labels, weights, lg, lse, ll)


def _bwd_mat(res, g):
    h, w, labels, weights, lg, lse, ll = res
    h16, w16, bf, lab, wt, M, V = _pad_all(
        h, w, jnp.zeros((w.shape[1],), w.dtype), labels, weights)
    Mp, Vp = h16.shape[0], w16.shape[1]
    H = h16.shape[1]
    gw = (g * wt).reshape(-1, 1)

    # dh kernel reads the materialized logits (zero-pad rows to the dh
    # block; gw=0 on pads makes their dl exactly zero regardless of lg)
    mpad = (-Mp) % _BMD
    lg_d, lab_d, lse_d, gw_d = lg, lab.reshape(-1, 1), lse, gw
    if mpad:
        lg_d = jnp.pad(lg_d, ((0, mpad), (0, 0)))
        lab_d = jnp.pad(lab_d, ((0, mpad), (0, 0)), constant_values=-1)
        lse_d = jnp.pad(lse_d, ((0, mpad), (0, 0)))
        gw_d = jnp.pad(gw_d, ((0, mpad), (0, 0)))
    Md = Mp + mpad
    dh = pl.pallas_call(
        functools.partial(_dh_mat_kernel, bv=_BV),
        grid=(Md // _BMD, Vp // _BV),     # rows OUTER
        in_specs=[
            pl.BlockSpec((_BMD, _BV), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _BV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BMD, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BMD, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BMD, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BMD, H), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Md, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BMD, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_DH),
        cost_estimate=pl.CostEstimate(
            flops=2 * Md * H * Vp,
            bytes_accessed=(Md * Vp * 2
                            + H * Vp * 2 * (Md // _BMD) + Md * H * 4),
            transcendentals=Md * Vp),
    )(lg_d, w16, lab_d, lse_d, gw_d)

    dw, db = pl.pallas_call(
        functools.partial(_dwdb_mat_kernel, v_real=V, bv=_BV),
        grid=(Vp // _BV, Mp // _BM),          # vocab OUTER
        in_specs=[
            pl.BlockSpec((_BM, H), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, _BV), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((H, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BV), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * H * Vp,
            bytes_accessed=(Mp * H * 2 * (Vp // _BV) + Mp * Vp * 2
                            + H * Vp * 4),
            transcendentals=Mp * Vp),
    )(h16, lg, lab.reshape(-1, 1), lse, gw)

    M_real = h.shape[0]
    dweights = (g * (lse[:M_real, 0] - ll[:M_real, 0])).astype(weights.dtype)
    return (dh[:M_real].astype(h.dtype),
            dw[:, :V].astype(w.dtype),
            db[0, :V].astype(w.dtype),
            None, dweights)


fused_linear_ce_hybrid.defvjp(_fwd_mat, _bwd_mat)


# ----------------------------------------------------------------------
# XLA forward + Pallas backward ("xla_bwd", Config.ce_xla_bwd)
# ----------------------------------------------------------------------
#
# The round-3 postmortem (PERF.md) found the HYBRID's loss came entirely
# from its forward: the in-kernel lse/label VPU passes serialize against
# the MXU matmul, while XLA's unfused forward (matmul+write, then one
# fused convert/reduce pass) is already at its materialized-logits
# roofline.  The backward is a different story: XLA runs THREE separate
# full passes over the [M, V] logits (dW fusion, dh fusion, and a
# standalone db column-sum — the round-5 trace puts db at 0.94 ms of
# pure re-read), whereas the hybrid's _dwdb_mat_kernel folds db into the
# dW pass for free (a VPU column-sum overlapping the MXU accumulation).
# This variant therefore pairs the incumbent XLA forward — bit-identical
# math to compute_loss's logits branch — with the round-3 Pallas
# backward kernels, reused verbatim: the one genuinely new schedule the
# postmortem left open.

@jax.custom_vjp
def fused_linear_ce_xla_bwd(h: jax.Array, w: jax.Array, b: jax.Array,
                            labels: jax.Array, weights: jax.Array
                            ) -> jax.Array:
    """Same contract as ``fused_linear_ce`` (Σ weights·CE); XLA forward,
    hybrid's Pallas backward reused verbatim (``_bwd_mat``: dW+db in ONE
    logits pass + the ``_dh_mat_kernel`` dh).  Round-5 TPU A/B: LOSES
    in-train (18.58 vs 17.95 ms at B=256 K=5,
    benchmarks/tpu_r5_logs/train_tail_ab2.log) — the Pallas dh re-reads
    W once per row block (~708 MB extra HBM at reference shapes),
    costing more than the db column-sum pass the dW kernel saves.
    Ships default-OFF as a validated alternative schedule."""
    loss, _ = _fwd_xla(h, w, b, labels, weights)
    return loss


def _fwd_xla(h, w, b, labels, weights):
    h16, w16, bf, lab, wt, M, V = _pad_all(h, w, b, labels, weights)
    Vp = w16.shape[1]
    if Vp != V:
        # -NEG bias on the pad columns: their exp underflows to exactly
        # 0.0 inside the lse, and the bwd kernels' p = exp(lg − lse) is
        # exactly 0 there, so pad columns contribute nothing to dW/db/dh
        bf = bf.at[V:].set(_NEG)
    # bf16 matmul + bf16 bias add — same compute path as the Dense head
    # the incumbent XLA branch runs (compute_loss logits branch)
    lg = (jax.lax.dot_general(h16, w16, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.bfloat16)
          + bf.astype(jnp.bfloat16)[None, :])
    # identical reduction formulation to compute_loss's logits branch:
    # converts live inside single-consumer elementwise chains so XLA
    # fuses all three V-reductions into one HBM pass over lg
    m = jax.lax.stop_gradient(jnp.max(lg, axis=-1, keepdims=True))
    sumexp = jnp.sum(jnp.exp((lg - m).astype(jnp.float32)), axis=-1)
    lse = jnp.log(sumexp) + m[:, 0].astype(jnp.float32)
    onehot = (lab[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, Vp), 1))
    ll = jnp.sum(jnp.where(onehot, lg, 0).astype(jnp.float32), axis=-1)
    loss = jnp.sum(wt * (lse - ll))
    # residual tuple shaped exactly as _fwd_mat's (bwd kernels shared)
    return loss, (h, w, labels, weights, lg,
                  lse.reshape(-1, 1), ll.reshape(-1, 1))


# A variant computing dh via hand-written jnp (exp/onehot/gw chain then
# dot) was tried and discarded during development: XLA materializes the
# hand-written dl16 [M, V] as its own HBM pass instead of fusing it
# into the dot operand (the same pathology the _dh_mat_kernel docstring
# records), so it cannot beat reusing _bwd_mat — which itself loses the
# in-train A/B above.  This whole schedule ships default-off.
fused_linear_ce_xla_bwd.defvjp(_fwd_xla, _bwd_mat)


# ----------------------------------------------------------------------
def fused_linear_ce_xla(h, w, b, labels, weights):
    """Reference implementation (CPU path / tests), same bf16 matmul."""
    logits = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b.astype(jnp.float32)[None, :]
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None].astype(jnp.int32),
                             axis=-1)[:, 0]
    return jnp.sum(weights * (lse - ll))
