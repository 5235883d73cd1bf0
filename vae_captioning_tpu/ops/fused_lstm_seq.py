"""Pallas TPU kernels: fused teacher-forcing LSTM layer (fwd + bwd).

The train step's LSTM scans are XLA's worst pattern in the round-3
xplane trace: per-timestep dynamic-update-slice stacking, per-step
convert fusions outlined from the while body, and VMEM staging copies
added ~7 ms/step on top of the ~2.6 ms of MXU work actually required at
reference train shapes (B·K = 1280, T = 24, H = 512).  This module
replaces the whole masked sequence run (``ops/lstm.py`` LSTMCell's
sequence branch — itself the TPU rebuild of the reference's
``tf.nn.dynamic_rnn``, ``vae_model/decoder.py:116-129``) with two Pallas
kernels:

  * **forward**: grid (T, row_blocks), t outermost.  The (c, h) state
    lives in VMEM scratch across the whole sequence; per step one fused
    block computes ``gates = x_t @ Wx + h @ Wh + b`` on the MXU plus the
    gate math on the VPU, and writes the step's outputs (h_t, c_t, and
    the four ACTIVATED gates — the backward residues) as contiguous
    [1, B, ·] tiles.  No dynamic-update-slice, no carry relayouts.
  * **backward** (custom VJP): grid (T, row_blocks) with t reversed via
    the index maps.  (dc, dh) ride VMEM scratch; dWx/dWh/db accumulate
    directly in their revisited output blocks (constant index map →
    VMEM-resident until the final flush).  Per step: dgates from the
    saved activated gates (one tanh recompute), then three MXU matmuls
    (dh_prev, dx_t, and the dW accumulations).

Numerics: matmuls bf16 with f32 accumulation (same as the unfused
path); gate math f32; saved gate activations and the h stack are bf16
(their only consumers are bf16 matmuls), the c stack is f32.  Masked
steps (t ≥ length) copy state through and emit zero outputs — identical
to ``dynamic_rnn(sequence_length=...)`` semantics.  The backward relies
on masks being MONOTONE per row (True then False), which is what
lengths produce; see ``_bwd_kernel``.

Gradients are validated against jax.grad of the XLA reference
(tests/test_fused_lstm_seq.py).  Kill switch: ``Config.fused_lstm_seq``
(models fall back to the lax.scan path).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 256                      # rows per block
_VMEM_LIMIT = 100 * 1024 * 1024  # dc/dh scratch is [B, H] f32 — see module doc
_FORGET_BIAS = 1.0             # TF LSTMCell parity (utils/rnn_model.py:23-35)

# Debug-mode guard (ADVICE r3): the backward is only correct for per-row
# MONOTONE masks (True then False, i.e. lengths-derived) — hs stores
# zeros at masked steps and h_prev for the dWh accumulation reads
# hs[t-1], valid only because an unmasked step t implies t-1 was
# unmasked.  Set VCT_CHECK_LSTM_MASK=1 (or flip the module flag) to
# verify every mask at runtime via a host callback.
DEBUG_MASK_CHECK = os.environ.get("VCT_CHECK_LSTM_MASK", "0") == "1"


def _assert_monotone_mask(mask) -> None:
    """Host-side check: every row must be 1...10...0 (no 0→1 step)."""
    m = np.asarray(mask).astype(bool)
    bad = np.logical_and(~m[:, :-1], m[:, 1:]).any(axis=1)
    if bad.any():
        rows = np.nonzero(bad)[0][:8].tolist()
        raise ValueError(
            "fused_lstm_seq: non-monotone mask rows "
            f"{rows} — the fused backward computes wrong dWh/dh for "
            "masks not derived from lengths; use the lax.scan path "
            "(Config.fused_lstm_seq=False) for arbitrary masks")


def _gate_slices(gates, H):
    return (gates[:, 0 * H:1 * H], gates[:, 1 * H:2 * H],
            gates[:, 2 * H:3 * H], gates[:, 3 * H:4 * H])


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------

def _fwd_kernel(x_ref, wx_ref, wh_ref, b_ref, m_ref, c0_ref, h0_ref,
                hs_ref, cs_ref, ga_ref, ct_ref, ht_ref,
                c_s, h_s, *, bm: int):
    t = pl.program_id(0)
    i = pl.program_id(1)
    H = c0_ref.shape[1]
    rows = pl.ds(i * bm, bm)

    @pl.when(t == 0)
    def _init():
        c_s[rows, :] = c0_ref[:, :]
        h_s[rows, :] = h0_ref[:, :]

    c = c_s[rows, :]
    h = h_s[rows, :]
    gates = (
        jax.lax.dot_general(x_ref[0], wx_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(h.astype(wh_ref.dtype), wh_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + b_ref[0, :][None, :])
    i_g, f_g, g_g, o_g = _gate_slices(gates, H)
    si = jax.nn.sigmoid(i_g)
    sf = jax.nn.sigmoid(f_g + _FORGET_BIAS)
    tg = jnp.tanh(g_g)
    so = jax.nn.sigmoid(o_g)
    nc = sf * c + si * tg
    nh = so * jnp.tanh(nc)

    m = m_ref[0]                              # [bm, 1] 0/1
    c_new = m * nc + (1.0 - m) * c
    h_new = m * nh + (1.0 - m) * h
    c_s[rows, :] = c_new
    h_s[rows, :] = h_new
    cs_ref[0] = c_new
    hs_ref[0] = (m * nh).astype(hs_ref.dtype)  # ys: zeros at masked steps
    ga_ref[0] = jnp.concatenate([si, sf, tg, so], axis=-1
                                ).astype(ga_ref.dtype)

    @pl.when(t == pl.num_programs(0) - 1)
    def _final():
        ct_ref[:, :] = c_new
        ht_ref[:, :] = h_new


def _fwd_call(x16, wx16, wh16, b, c0, h0, mask_f):
    T, Bp, E = x16.shape
    H = c0.shape[1]
    bm = _BM if Bp >= _BM else 128
    n_b = Bp // bm
    hs, cs, ga, ct, ht = pl.pallas_call(
        functools.partial(_fwd_kernel, bm=bm),
        grid=(T, n_b),
        in_specs=[
            pl.BlockSpec((1, bm, E), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 1), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bm, H), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, H), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 4 * H), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.bfloat16),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bp, H), jnp.float32),
            pltpu.VMEM((Bp, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * Bp * (E + H) * 4 * H,
            bytes_accessed=(T * Bp * (2 * E + 2 * H + 4 + 8 * H + 8 * H)
                            + (E + H) * 4 * H * 2),
            transcendentals=5 * T * Bp * H),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(x16, wx16, wh16, b.astype(jnp.float32).reshape(1, -1),
      mask_f, c0, h0)
    return hs, cs, ga, ct, ht


# ----------------------------------------------------------------------
# backward
# ----------------------------------------------------------------------

def _bwd_kernel(ga_ref, cst_ref, csp_ref, hsp_ref, x_ref, m_ref,
                c0_ref, h0_ref, dhs_ref, dct_ref, dht_ref,
                wx_ref, wh_ref,
                dx_ref, dc0_ref, dh0_ref, dwx_ref, dwh_ref, db_ref,
                dc_s, dh_s, *, bm: int):
    t = pl.program_id(0)           # 0 .. T-1, walking tr = T-1-t
    i = pl.program_id(1)
    T = pl.num_programs(0)
    tr = T - 1 - t
    H = c0_ref.shape[1]
    rows = pl.ds(i * bm, bm)

    @pl.when(t == 0)
    def _init_carry():
        dc_s[rows, :] = dct_ref[:, :]
        dh_s[rows, :] = dht_ref[:, :]

    @pl.when(jnp.logical_and(t == 0, i == 0))
    def _init_acc():
        dwx_ref[:, :] = jnp.zeros(dwx_ref.shape, dwx_ref.dtype)
        dwh_ref[:, :] = jnp.zeros(dwh_ref.shape, dwh_ref.dtype)
        db_ref[:, :] = jnp.zeros(db_ref.shape, db_ref.dtype)

    m = m_ref[0]                               # [bm, 1] 0/1
    ga = ga_ref[0].astype(jnp.float32)
    si, sf, tg, so = _gate_slices(ga, H)
    c_t = cst_ref[0]
    is_first = tr == 0
    c_prev = jnp.where(is_first, c0_ref[:, :], csp_ref[0])
    h_prev = jnp.where(is_first, h0_ref[:, :].astype(jnp.float32),
                       hsp_ref[0].astype(jnp.float32))

    dh_carry = dh_s[rows, :]
    dc_carry = dc_s[rows, :]
    # h_t = m·nh + (1−m)·h_prev ; ys_t = m·nh (zeros when masked)
    dnh = m * (dh_carry + dhs_ref[0].astype(jnp.float32))
    dh_pass = (1.0 - m) * dh_carry
    tanh_c = jnp.tanh(c_t)         # = tanh(nc) on unmasked rows (m·…)
    dnc = dnh * so * (1.0 - tanh_c * tanh_c) + m * dc_carry
    dc_pass = (1.0 - m) * dc_carry

    do_pre = dnh * tanh_c * so * (1.0 - so)
    di_pre = dnc * tg * si * (1.0 - si)
    df_pre = dnc * c_prev * sf * (1.0 - sf)
    dg_pre = dnc * si * (1.0 - tg * tg)
    dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
    dg16 = dgates.astype(jnp.bfloat16)

    dh_prev = jax.lax.dot_general(
        dg16, wh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + dh_pass
    dc_prev = dnc * sf + dc_pass
    dx_ref[0] = jax.lax.dot_general(
        dg16, wx_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    h16 = h_prev.astype(jnp.bfloat16)
    dwh_ref[:, :] += jax.lax.dot_general(
        h16, dg16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwx_ref[:, :] += jax.lax.dot_general(
        x_ref[0], dg16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:, :] += jnp.sum(dgates, axis=0, keepdims=True)

    dc_s[rows, :] = dc_prev
    dh_s[rows, :] = dh_prev

    @pl.when(t == T - 1)
    def _final():
        dc0_ref[:, :] = dc_prev
        dh0_ref[:, :] = dh_prev


def _bwd_call(x16, wx16, wh16, mask_f, c0, h0, cs, hs, ga,
              dhs, dct, dht):
    T, Bp, E = x16.shape
    H = c0.shape[1]
    bm = _BM if Bp >= _BM else 128
    n_b = Bp // bm

    def rev(tt):
        return T - 1 - tt

    def rev_prev(tt):
        return jnp.maximum(T - 2 - tt, 0)

    dx, dc0, dh0, dwx, dwh, db = pl.pallas_call(
        functools.partial(_bwd_kernel, bm=bm),
        grid=(T, n_b),
        in_specs=[
            pl.BlockSpec((1, bm, 4 * H), lambda t, i: (rev(t), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, H), lambda t, i: (rev(t), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, H), lambda t, i: (rev_prev(t), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, H), lambda t, i: (rev_prev(t), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, E), lambda t, i: (rev(t), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 1), lambda t, i: (rev(t), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, H), lambda t, i: (rev(t), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bm, E), lambda t, i: (rev(t), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, E), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((E, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bp, H), jnp.float32),
            pltpu.VMEM((Bp, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * Bp * 4 * H * (2 * H + 2 * E),
            bytes_accessed=(T * Bp * (8 * H + 4 * H + 2 * E + 4 * E
                                      + 2 * H) + (E + H) * 4 * H * 6),
            transcendentals=T * Bp * H),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(ga, cs, cs, hs, x16, mask_f, c0, h0, dhs, dct, dht, wx16, wh16)
    return dx, dc0, dh0, dwx, dwh, db


# ----------------------------------------------------------------------
# custom-VJP wrapper
# ----------------------------------------------------------------------

def _pad_rows(a, pad):
    if pad == 0:
        return a
    cfg = [(0, 0)] * a.ndim
    cfg[-2 if a.ndim == 3 else 0] = (0, pad)
    return jnp.pad(a, cfg)


@jax.custom_vjp
def _fls(x, wx, wh, b, c0, h0, mask):
    out, _ = _fls_fwd(x, wx, wh, b, c0, h0, mask)
    return out


def _prep(x, wx, wh, c0, h0, mask):
    T, B, E = x.shape
    bm = _BM if B >= _BM else 128
    pad = (-B) % bm
    x16 = _pad_rows(x.astype(jnp.bfloat16), pad)
    c0p = _pad_rows(c0, pad)
    h0p = _pad_rows(h0, pad)
    # mask arrives [B, T]; kernels consume it as [T, B, 1] (a [·, bm, 1]
    # block keeps the last-two-dims alignment rule happy).  Padded rows
    # get 0 → pure pass-through.
    mask_f = jnp.pad(mask.astype(jnp.float32), ((0, pad), (0, 0)))
    mask_f = mask_f.T[:, :, None]
    return x16, wx.astype(jnp.bfloat16), wh.astype(jnp.bfloat16), \
        c0p, h0p, mask_f, pad


def _fls_fwd(x, wx, wh, b, c0, h0, mask):
    B = x.shape[1]
    x16, wx16, wh16, c0p, h0p, mask_f, pad = _prep(x, wx, wh, c0, h0, mask)
    hs, cs, ga, ct, ht = _fwd_call(x16, wx16, wh16, b, c0p, h0p, mask_f)
    out = (ct[:B], ht[:B], hs[:, :B])
    res = (x16, wx16, wh16, mask_f, c0p, h0p, cs, hs, ga, B)
    return out, res


def _fls_bwd(res, cots):
    x16, wx16, wh16, mask_f, c0p, h0p, cs, hs, ga, B = res
    dct, dht, dhs = cots
    Bp = x16.shape[1]
    pad = Bp - B
    dct = _pad_rows(dct, pad)
    dht = _pad_rows(dht, pad)
    dhs = _pad_rows(dhs.astype(jnp.bfloat16), pad)
    dx, dc0, dh0, dwx, dwh, db = _bwd_call(
        x16, wx16, wh16, mask_f, c0p, h0p, cs, hs, ga, dhs, dct, dht)
    return (dx[:, :B], dwx, dwh, db.reshape(-1), dc0[:B], dh0[:B],
            jnp.zeros((B, mask_f.shape[0])))


_fls.defvjp(_fls_fwd, _fls_bwd)


def fused_lstm_seq(x: jax.Array, wx: jax.Array, wh: jax.Array,
                   b: jax.Array, c0: jax.Array, h0: jax.Array,
                   mask: jax.Array
                   ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
    """Masked teacher-forcing LSTM layer, fully fused.

    x: [T, B, E] (time-major inputs), wx: [E, 4H], wh: [H, 4H], b: [4H],
    c0/h0: [B, H] f32, mask: [B, T] bool/0-1 (monotone per row — built
    from lengths) → ((c_T, h_T) f32, hs [T, B, H] bf16 with zeros at
    masked steps).  Gate order (i, f, g, o), forget_bias 1.0 — identical
    semantics to ops/lstm.LSTMCell's sequence branch.

    Requires E and H to be multiples of 128 (reference dims: 256/512).
    """
    assert x.shape[-1] % 128 == 0 and c0.shape[-1] % 128 == 0, (
        "fused_lstm_seq needs lane-aligned E and H; use the scan path")
    if DEBUG_MASK_CHECK:
        jax.debug.callback(_assert_monotone_mask, mask)
    # f32 mask up front so the custom-VJP cotangent dtypes line up
    ct, ht, hs = _fls(x, wx, wh, b, c0, h0, mask.astype(jnp.float32))
    return (ct, ht), hs


def fused_lstm_seq_xla(x, wx, wh, b, c0, h0, mask):
    """Reference implementation with the kernel's precision semantics
    (bf16 matmuls, f32 accumulation + gate math, bf16 hs) — CPU tests
    and grad validation."""
    w16x = wx.astype(jnp.bfloat16)
    w16h = wh.astype(jnp.bfloat16)
    bf = b.astype(jnp.float32)

    def body(ch, inp):
        c, h = ch
        x_t, m_t = inp
        gates = (
            jax.lax.dot_general(x_t.astype(jnp.bfloat16), w16x,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(h.astype(jnp.bfloat16), w16h,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            + bf)
        i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
        nc = (jax.nn.sigmoid(f_g + _FORGET_BIAS) * c
              + jax.nn.sigmoid(i_g) * jnp.tanh(g_g))
        nh = jax.nn.sigmoid(o_g) * jnp.tanh(nc)
        m = m_t[:, None]
        return ((jnp.where(m, nc, c), jnp.where(m, nh, h)),
                jnp.where(m, nh, 0.0).astype(jnp.bfloat16))

    (c, h), hs = jax.lax.scan(body, (c0, h0), (x, mask.T.astype(bool)))
    return (c, h), hs
