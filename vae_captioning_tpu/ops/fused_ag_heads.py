"""Pallas TPU kernels: fused AG-prior recognition heads + c_v combine.

The AG encoder head (models/encoder.py; ref vae_model/encoder.py:76-107)
computes per-cluster posteriors and their convex combination:

    q      = h @ W + b                  # [B, 2·K·L] (μ ‖ logσ), K=90 L=150
    μ_k    = q[:, :K·L]   as [B, K, L]
    σ_k    = exp(q[:, K·L:]) as [B, K, L]
    q_mean = Σ_k c_v[:, k] · μ_k        # [B, L]
    q_std  = Σ_k c_v[:, k] · σ_k        # [B, L]

XLA runs this as an f32 [B, 27000] matmul + two layout-changing
reshapes ([B,13500]⇄[B,90,150] cost 0.66 ms of pure relayout in the
round-5 train-step trace) + exp fusion + two einsums, and mirrors the
same structure backward — ~2.2 ms of the 17.9 ms reference-shape train
step against a ~0.4 ms flop/byte floor.

Here one forward kernel and one backward kernel keep every [B, ·K·L]
intermediate in VMEM.  The cluster dimension is processed in groups of
``KB`` clusters (KB·L ≈ 1200 lanes, dense — no per-cluster padding to
128), and all cluster bookkeeping is MXU contractions against 0/1
selection matrices built in-kernel from iota (no unaligned lane
slicing, no gathers):

    M_g[j, c] = [j == g·KB + c//L]   (cluster-of-column)  [Kp, KB·L]
    F[c, l]   = [c % L == l]         (fold-to-latent)     [KB·L, L]

forward per (group g, row tile b):
    q_m/q_s tile = h_b @ W_{m/s,g} + b_{m/s,g}       (MXU, f32 accum)
    cvrep        = c_v_b @ M_g                        (repeat weights)
    acc_mean    += (q_m · cvrep) @ F
    acc_std     += (exp(q_s) · cvrep) @ F

backward (one kernel, same grid): recomputes the q_s tile (flash-style —
no [B, K·L] residual), forms dq_m = (g_mean @ Fᵀ)·cvrep and
dq_s = (g_std @ Fᵀ)·cvrep·σ in registers, and accumulates
    dW blocks   (per-g outputs, revisited over row tiles)
    db blocks   (column sums)
    dh, dc_v    (full-batch f32 VMEM scratch, published at the end)

Numerics: bf16 MXU operands with f32 accumulation — the same class as
the incumbent (XLA's default-precision f32 matmul and einsums also run
bf16 passes on TPU); validated against a jnp reference in
tests/test_fused_ag_heads.py and by a train-trajectory A/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024
_BT = 256              # row tile
_TARGET_LANES = 1280   # KB = clusters per group s.t. KB·L ≈ this


def _group_geometry(K: int, L: int):
    kb = max(1, min(K, _TARGET_LANES // L))
    g = -(-K // kb)           # ceil
    return kb, g, g * kb      # KB, G, Kp


def _masks(g, kb: int, L: int, kp: int, dtype=jnp.bfloat16):
    """Selection matrices for group ``g`` built from iota (0/1, exact in
    bf16).  M_g: [Kp, KB·L] cluster-of-column; F: [KB·L, L] fold."""
    cw = kb * L
    j = jax.lax.broadcasted_iota(jnp.int32, (kp, cw), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (kp, cw), 1)
    m_g = (j == g * kb + c // L).astype(dtype)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (cw, L), 0)
    l2 = jax.lax.broadcasted_iota(jnp.int32, (cw, L), 1)
    f = (c2 % L == l2).astype(dtype)
    return m_g, f


def _fwd_kernel(h_ref, wm_ref, ws_ref, bm_ref, bs_ref, cv_ref,
                om_ref, os_ref, accm, accs,
                *, kb: int, L: int, kp: int, bt: int):
    g = pl.program_id(0)
    bi = pl.program_id(1)

    @pl.when((g == 0) & (bi == 0))
    def _init():
        accm[:, :] = jnp.zeros_like(accm)
        accs[:, :] = jnp.zeros_like(accs)

    qm = jax.lax.dot_general(
        h_ref[:, :], wm_ref[0, :, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bm_ref[0, :, :]
    qs = jax.lax.dot_general(
        h_ref[:, :], ws_ref[0, :, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bs_ref[0, :, :]
    s = jnp.exp(qs)
    m_g, f = _masks(g, kb, L, kp)
    cvrep = jax.lax.dot_general(
        cv_ref[:, :].astype(jnp.bfloat16), m_g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rows = pl.ds(bi * bt, bt)
    accm[rows, :] += jax.lax.dot_general(
        (qm * cvrep).astype(jnp.bfloat16), f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    accs[rows, :] += jax.lax.dot_general(
        (s * cvrep).astype(jnp.bfloat16), f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when((g == pl.num_programs(0) - 1) & (bi == pl.num_programs(1) - 1))
    def _publish():
        om_ref[:, :] = accm[:, :]
        os_ref[:, :] = accs[:, :]


def _bwd_kernel(h_ref, wm_ref, ws_ref, bs_ref, cv_ref, gm_ref, gs_ref,
                bm_ref,
                dwm_ref, dws_ref, dbm_ref, dbs_ref, dh_ref, dcv_ref,
                dh_acc, dcv_acc,
                *, kb: int, L: int, kp: int, bt: int):
    g = pl.program_id(0)
    bi = pl.program_id(1)

    @pl.when((g == 0) & (bi == 0))
    def _init_batch():
        dh_acc[:, :] = jnp.zeros_like(dh_acc)
        dcv_acc[:, :] = jnp.zeros_like(dcv_acc)

    @pl.when(bi == 0)
    def _init_group():
        dwm_ref[:, :, :] = jnp.zeros(dwm_ref.shape, dwm_ref.dtype)
        dws_ref[:, :, :] = jnp.zeros(dws_ref.shape, dws_ref.dtype)
        dbm_ref[:, :, :] = jnp.zeros(dbm_ref.shape, dbm_ref.dtype)
        dbs_ref[:, :, :] = jnp.zeros(dbs_ref.shape, dbs_ref.dtype)

    # recompute the group's q tiles (flash-style: no [B, K·L] residual)
    qm = jax.lax.dot_general(
        h_ref[:, :], wm_ref[0, :, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bm_ref[0, :, :]
    qs = jax.lax.dot_general(
        h_ref[:, :], ws_ref[0, :, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bs_ref[0, :, :]
    s = jnp.exp(qs)
    m_g, f = _masks(g, kb, L, kp)
    cvrep = jax.lax.dot_general(
        cv_ref[:, :].astype(jnp.bfloat16), m_g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # unfold the [bt, L] output cotangents to [bt, KB·L] (g @ Fᵀ)
    gunf_m = jax.lax.dot_general(
        gm_ref[:, :].astype(jnp.bfloat16), f, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gunf_s = jax.lax.dot_general(
        gs_ref[:, :].astype(jnp.bfloat16), f, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dqm = (gunf_m * cvrep).astype(jnp.bfloat16)
    dqs = (gunf_s * cvrep * s).astype(jnp.bfloat16)

    h16 = h_ref[:, :]
    dwm_ref[:, :, :] += jax.lax.dot_general(
        h16, dqm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    dws_ref[:, :, :] += jax.lax.dot_general(
        h16, dqs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None]
    dbm_ref[:, :, :] += jnp.sum(dqm.astype(jnp.float32), axis=0,
                                keepdims=True)[None]
    dbs_ref[:, :, :] += jnp.sum(dqs.astype(jnp.float32), axis=0,
                                keepdims=True)[None]

    rows = pl.ds(bi * bt, bt)
    dh_acc[rows, :] += jax.lax.dot_general(
        dqm, wm_ref[0, :, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_acc[rows, :] += jax.lax.dot_general(
        dqs, ws_ref[0, :, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dc_v[b, k] = Σ_l g_mean·μ + g_std·σ  — contribution @ M_gᵀ lands in
    # this group's Kp columns, zeros elsewhere (exact 0/1 factor)
    contrib = (qm * gunf_m + s * gunf_s).astype(jnp.bfloat16)
    dcv_acc[rows, :] += jax.lax.dot_general(
        contrib, m_g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when((g == pl.num_programs(0) - 1) & (bi == pl.num_programs(1) - 1))
    def _publish():
        dh_ref[:, :] = dh_acc[:, :]
        dcv_ref[:, :] = dcv_acc[:, :]


def _prep(h, w, b, c_v):
    """Pad/reshape the operands to the kernel geometry (traced, cheap:
    one ~30 MB bf16 rewrite of W per step at reference shapes)."""
    B, H = h.shape
    K = c_v.shape[1]
    KL = w.shape[1] // 2
    L = KL // K
    kb, G, Kp = _group_geometry(K, L)
    cw = kb * L

    def half(wh):          # [H, K·L] -> [G, H, KB·L] bf16
        w3 = wh.reshape(H, K, L)
        w3 = jnp.pad(w3.astype(jnp.bfloat16), ((0, 0), (0, Kp - K), (0, 0)))
        return jnp.transpose(w3.reshape(H, G, cw), (1, 0, 2))

    def bhalf(bh):         # [K·L] -> [G, 1, KB·L] f32 (the dummy
        # middle axis keeps the BlockSpec's last two dims equal to the
        # array dims — Mosaic rejects a (1, cw) block on a [G, cw] array)
        b2 = jnp.pad(bh.reshape(K, L).astype(jnp.float32),
                     ((0, Kp - K), (0, 0)))
        return b2.reshape(G, 1, cw)

    wm, ws = half(w[:, :KL]), half(w[:, KL:])
    bm, bs = bhalf(b[:KL]), bhalf(b[KL:])

    b8 = B + ((-B) % 8)            # sublane multiple
    bt = _BT if b8 >= _BT else b8  # row tile (small batches: one tile)
    bp = (-B) % bt
    h16 = jnp.pad(h.astype(jnp.bfloat16), ((0, bp), (0, 0)))
    cvp = jnp.pad(c_v.astype(jnp.float32), ((0, bp), (0, Kp - K)))
    return (h16, wm, ws, bm, bs, cvp,
            dict(B=B, Bp=B + bp, H=H, K=K, L=L, kb=kb, G=G, Kp=Kp,
                 cw=cw, bt=bt))


@jax.custom_vjp
def fused_ag_heads(h: jax.Array, w: jax.Array, b: jax.Array,
                   c_v: jax.Array):
    """AG recognition heads + convex combine in one fused pass.

    h: [B, H] f32 (encoder final hidden); w: [H, 2·K·L] (the q_heads
    Dense kernel, μ half then logσ half); b: [2·K·L]; c_v: [B, K].
    Returns (q_mean, q_std), each [B, L] f32 — same contract as the XLA
    path in models/encoder.py.
    """
    out, _ = _fwd(h, w, b, c_v)
    return out


def _fwd(h, w, b, c_v):
    h16, wm, ws, bm, bs, cvp, geo = _prep(h, w, b, c_v)
    G, bt, Bp, H, L = geo["G"], geo["bt"], geo["Bp"], geo["H"], geo["L"]
    cw, Kp, kb = geo["cw"], geo["Kp"], geo["kb"]
    nb = Bp // bt
    qm, qs = pl.pallas_call(
        functools.partial(_fwd_kernel, kb=kb, L=L, kp=Kp, bt=bt),
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec((bt, H), lambda g, b_: (b_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, cw), lambda g, b_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, cw), lambda g, b_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cw), lambda g, b_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cw), lambda g, b_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Kp), lambda g, b_: (b_, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bp, L), lambda g, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, L), lambda g, b_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, L), jnp.float32),
            jax.ShapeDtypeStruct((Bp, L), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((Bp, L), jnp.float32),
                        pltpu.VMEM((Bp, L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * H * G * cw,
            bytes_accessed=(nb * G * bt * H * 2 + 2 * G * H * cw * 2
                            + 2 * Bp * L * 4),
            transcendentals=Bp * G * cw),
    )(h16, wm, ws, bm, bs, cvp)
    B = geo["B"]
    return (qm[:B], qs[:B]), (h, w, b, c_v)


def _bwd(res, cts):
    h, w, b, c_v = res
    g_mean, g_std = cts
    h16, wm, ws, bm, bs, cvp, geo = _prep(h, w, b, c_v)
    B, Bp, H, L = geo["B"], geo["Bp"], geo["H"], geo["L"]
    G, bt, cw, Kp, kb, K = (geo["G"], geo["bt"], geo["cw"], geo["Kp"],
                            geo["kb"], geo["K"])
    nb = Bp // bt
    bp = Bp - B
    gm = jnp.pad(g_mean.astype(jnp.float32), ((0, bp), (0, 0)))
    gs = jnp.pad(g_std.astype(jnp.float32), ((0, bp), (0, 0)))
    dwm, dws, dbm, dbs, dh, dcv = pl.pallas_call(
        functools.partial(_bwd_kernel, kb=kb, L=L, kp=Kp, bt=bt),
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec((bt, H), lambda g_, b_: (b_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, cw), lambda g_, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, cw), lambda g_, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cw), lambda g_, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Kp), lambda g_, b_: (b_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L), lambda g_, b_: (b_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L), lambda g_, b_: (b_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cw), lambda g_, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, cw), lambda g_, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, cw), lambda g_, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cw), lambda g_, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cw), lambda g_, b_: (g_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, H), lambda g_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Kp), lambda g_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, H, cw), jnp.float32),
            jax.ShapeDtypeStruct((G, H, cw), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, cw), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, cw), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Kp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32),
                        pltpu.VMEM((Bp, Kp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * Bp * H * G * cw,
            bytes_accessed=(nb * G * bt * H * 2 + 2 * G * H * cw * 6
                            + Bp * (H + Kp) * 4),
            transcendentals=Bp * G * cw),
    )(h16, wm, ws, bs, cvp, gm, gs, bm)

    def unhalf(d3):        # [G, H, cw] -> [H, K·L] (drop cluster pad)
        d = jnp.transpose(d3, (1, 0, 2)).reshape(H, Kp, L)[:, :K, :]
        return d.reshape(H, K * L)

    def unbias(d3):        # [G, 1, cw] -> [K·L]
        return d3.reshape(Kp, L)[:K].reshape(K * L)

    dw = jnp.concatenate([unhalf(dwm), unhalf(dws)], axis=1).astype(w.dtype)
    db = jnp.concatenate([unbias(dbm), unbias(dbs)]).astype(b.dtype)
    return (dh[:B].astype(h.dtype), dw, db,
            dcv[:B, :K].astype(c_v.dtype))


fused_ag_heads.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
def ag_heads_xla(h, w, b, c_v):
    """jnp reference — the models/encoder.py AG math with the kernel's
    rounding points made explicit (bf16 MXU operands, f32 accumulation):
    used by tests for exact-tolerance comparison."""
    KL = w.shape[1] // 2
    K = c_v.shape[1]
    L = KL // K
    q = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b.astype(jnp.float32)[None, :]
    B = h.shape[0]
    means = q[:, :KL].reshape(B, K, L)
    stds = jnp.exp(q[:, KL:]).reshape(B, K, L)
    cv16 = c_v.astype(jnp.bfloat16).astype(jnp.float32)
    mean = jnp.einsum("bk,bkl->bl", cv16, means,
                      precision=jax.lax.Precision.HIGHEST)
    std = jnp.einsum("bk,bkl->bl", cv16, stds,
                     precision=jax.lax.Precision.HIGHEST)
    return mean, std
