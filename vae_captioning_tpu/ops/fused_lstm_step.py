"""Pallas TPU kernel: fused LSTM decode step.

One kernel per decode step for the whole ``[N]`` token batch:

    gates  = [x, h] @ W + b                     (one MXU matmul, f32 accum)
    new_c  = sigmoid(f + forget_bias)·c + sigmoid(i)·tanh(g)
    new_h  = sigmoid(o)·tanh(new_c)

with ``x = embedding[tokens]`` gathered by XLA immediately before the
kernel (a [N, E] row gather is a hardware-fast op and fuses into the same
program; an in-kernel mask-reduce gather was built and measured 3% SLOWER
end-to-end — Mosaic's 16-row alignment rules force ~2·16·E VPU ops per
row).  What the kernel buys: the ``zh`` concat and the 4H-wide f32
``gates`` tensor (the big intermediate — [N, 4H] f32 is 50 MB/step at
N = 6144) never exist in HBM, and the matmul + bias + gate math + both
state updates issue as one fused pass over VMEM blocks.

This replaces the decode step's XLA op chain (embedding gather, concat,
gate matmul, elementwise gate math — ``ops/lstm.py:44-63`` /
``models/decoder.py:93-100``).  The reference has no analogue — its
decode ran one ``sess.run`` per token per beam
(``vae_model/decoder.py:256-267``); this is the TPU-native floor for the
same cell math (gate order i,f,g,o and forget_bias=1.0 preserved, ref
``utils/rnn_model.py:23-35`` TF LSTMCell semantics).

Numerics match the unfused path exactly in structure: embedding and W are
rounded to ``compute_dtype`` (bfloat16) before the matmul — rounding the
table once equals the unfused path's cast of ``concat([x, h])``
elementwise — accumulation is f32, bias add and gate math f32.  Beams are
bit-identical to the unfused path on TPU (tests + tpu A/B).  Kill switch:
``Config.fused_lstm_step`` (see inference.make_decode_fns).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 256  # rows (decode lanes) per block


def _kernel(x_ref, c_ref, h_ref, w_ref, b_ref, nc_ref, nh_ref,
            *, forget_bias: float):
    # ---- fused gate matmul: [BM, E+H] @ [E+H, 4H], f32 accumulation
    zh = jnp.concatenate(
        [x_ref[:], h_ref[:].astype(x_ref.dtype)], axis=-1)
    gates = jax.lax.dot_general(
        zh, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, :][None, :]

    # ---- gate order (i, f, g, o), forget_bias — ref TF LSTMCell parity
    H = c_ref.shape[1]
    i_g = gates[:, 0 * H:1 * H]
    f_g = gates[:, 1 * H:2 * H]
    g_g = gates[:, 2 * H:3 * H]
    o_g = gates[:, 3 * H:4 * H]
    new_c = (jax.nn.sigmoid(f_g + forget_bias) * c_ref[:]
             + jax.nn.sigmoid(i_g) * jnp.tanh(g_g))
    nc_ref[:] = new_c
    nh_ref[:] = jax.nn.sigmoid(o_g) * jnp.tanh(new_c)


@functools.partial(jax.jit, static_argnames=("forget_bias",))
def fused_lstm_step(tokens: jax.Array, c: jax.Array, h: jax.Array,
                    embed: jax.Array, w: jax.Array, b: jax.Array,
                    forget_bias: float = 1.0
                    ) -> Tuple[jax.Array, jax.Array]:
    """tokens [M] i32, c/h [M, H] f32, embed [V, E], w [E+H, 4H], b [4H]
    → (new_c, new_h) [M, H] f32."""
    M, H = c.shape
    E = embed.shape[1]
    # XLA-side gather of bf16 rows: rounding the table to bf16 BEFORE the
    # gather equals the unfused path's elementwise cast of concat([x, h])
    x16 = embed.astype(jnp.bfloat16)[tokens]
    w16 = w.astype(jnp.bfloat16)
    m_pad = (-M) % _BM
    if m_pad:
        x16 = jnp.pad(x16, ((0, m_pad), (0, 0)))
        c = jnp.pad(c, ((0, m_pad), (0, 0)))
        h = jnp.pad(h, ((0, m_pad), (0, 0)))
    Mp = c.shape[0]
    n_m = Mp // _BM

    nc, nh = pl.pallas_call(
        functools.partial(_kernel, forget_bias=float(forget_bias)),
        grid=(n_m,),
        in_specs=[
            pl.BlockSpec((_BM, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E + H, 4 * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BM, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, H), jnp.float32),
            jax.ShapeDtypeStruct((Mp, H), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * (E + H) * 4 * H,
            bytes_accessed=(Mp * E * 2 + (E + H) * 4 * H * 2
                            + 4 * Mp * H * 4),
            transcendentals=4 * Mp * H),
    )(x16, c, h, w16, b.astype(jnp.float32).reshape(1, -1))
    return nc[:M], nh[:M]


def fused_lstm_step_xla(tokens, c, h, embed, w, b, forget_bias=1.0):
    """Reference implementation (CPU / correctness tests) with the same
    precision semantics as the kernel AND the production unfused path
    (ops/lstm.py LSTMCell: bf16 matmul, f32 accumulation + gate math)."""
    x = embed[tokens]
    zh = jnp.concatenate([x, h], axis=-1)
    gates = jax.lax.dot_general(
        zh.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
    new_c = (jax.nn.sigmoid(f_g + forget_bias) * c
             + jax.nn.sigmoid(i_g) * jnp.tanh(g_g))
    new_h = jax.nn.sigmoid(o_g) * jnp.tanh(new_c)
    return new_c, new_h
