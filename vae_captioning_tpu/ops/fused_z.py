"""Pallas TPU kernel: fused z-sampling + projection for the TRAIN path.

The CVAE train step draws ``K_z = gen_z_samples`` (100) reparameterized
z samples per caption row and feeds them to the decoder only through the
linear ``z_proj``: ``z_dec = z_proj(concat_s (mu + sigma * eps_s))``
(models/cvae.py; ref vae_model/decoder.py:96-114).  XLA's path
generates ``[B*K, K_z*L]`` threefry normals (19.2 M draws, ~1.4 ms of
the reference-shape train step) and round-trips them through HBM just
to feed a tiny matmul.

This kernel never materializes the samples: a grid over the K_z sample
axis draws each ``eps_s`` tile from the on-chip PRNG
(``pltpu.prng_random_bits``, inverse-CDF normal via ``erf_inv``),
forms ``(mu + sigma*eps_s)`` in registers, and MXU-accumulates
``tile @ W_s`` into the ``[B, E]`` output.  The backward (custom VJP)
regenerates the same ``eps_s`` from the same seeds — flash-style
recompute, no residual noise tensor:

    d_mu    = sum_s dz @ W_s^T
    d_sigma = sum_s eps_s * (dz @ W_s^T)
    d_W_s   = (mu + sigma*eps_s)^T @ dz        d_bias = sum_b dz

Law parity: eps is iid N(0, 1) exactly as in the XLA path (different
random stream, same distribution — same stance as the decode-time
projected-space draw, Decoder.gen_z_embedding).  The projection math
matches the Dense path: bf16 operands, f32 accumulation over the whole
K_z*L contraction, one bf16 round at the end.

Numerics are validated against an explicit jnp reference fed with the
kernel's own eps (exposed by ``sample_project_debug_eps``) in
tests/test_fused_z.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 256          # latent dim padded to this many lanes (L = 150)
_ROOT2 = 1.4142135623730951
# The bwd keeps dmu/dsg (2·[M, Lp] f32, M = B·K rows) resident across
# the sample grid plus the full dW' ([K_z·Lp, E] f32 = 26.2 MB at
# reference dims) on the Mosaic VMEM stack; under the 32 MiB default
# that caps the per-chip train batch at 512 (M=2560) — B=1024 needs
# 36.25M and fails compile with "stack oom".  64 MiB covers B·K up to
# ~10k rows (measured on TPU: B=1024 and B=2048 both compile and run —
# 15.8k / 16.0k img/s, the train-ladder knee, PERF.md round-5) and,
# like the top-K kernel's limit, the VALUE only caps what Mosaic may
# co-schedule — it reserves nothing and measures speed-neutral at
# B=256.  Row-tiling dmu/dsg would lift the ceiling entirely but
# changes the eps tile shape (a different, stream-incompatible draw);
# beyond B≈2048/chip the intended scaling axis is dp sharding anyway.
_VMEM_LIMIT = 64 * 1024 * 1024


def _normal_tile(seed0, seed1, s: int, tag: int, shape) -> jax.Array:
    """iid N(0,1) tile from the on-chip PRNG: one 23-bit uniform per
    element (exact int->f32), inverse CDF via erf_inv.  ``tag`` keeps
    forward/backward *call sites* on the same stream for the same s."""
    pltpu.prng_seed(seed0, seed1 * 7919 + s * 2 + tag)
    bits = pltpu.prng_random_bits(shape)
    u = (pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 9, jnp.int32)
         .astype(jnp.float32)) / (2.0 ** 23)
    u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
    return _ROOT2 * jax.lax.erf_inv(2.0 * u - 1.0)


def _fwd_kernel(seed_ref, mu_ref, sg_ref, w_ref, b_ref, out_ref, acc,
                *, n_samples: int):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        acc[:, :] = jnp.zeros_like(acc)

    eps = _normal_tile(seed_ref[0], seed_ref[1], s, 0, mu_ref.shape)
    tile = (mu_ref[:, :] + sg_ref[:, :] * eps).astype(jnp.bfloat16)
    acc[:, :] += jax.lax.dot_general(
        tile, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(s == n_samples - 1)
    def _publish():
        out_ref[:, :] = (acc[:, :].astype(jnp.bfloat16)
                         + b_ref[0, :][None, :].astype(jnp.bfloat16))


def _bwd_kernel(seed_ref, mu_ref, sg_ref, w_ref, dz_ref,
                dmu_ref, dsg_ref, dw_ref, dmu_acc, dsg_acc,
                *, n_samples: int):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        dmu_acc[:, :] = jnp.zeros_like(dmu_acc)
        dsg_acc[:, :] = jnp.zeros_like(dsg_acc)

    eps = _normal_tile(seed_ref[0], seed_ref[1], s, 0, mu_ref.shape)
    # t = dz @ W_s^T  [B, Lp]
    t = jax.lax.dot_general(
        dz_ref[:, :], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dmu_acc[:, :] += t
    dsg_acc[:, :] += t * eps
    tile = (mu_ref[:, :] + sg_ref[:, :] * eps).astype(jnp.bfloat16)
    dw_ref[:, :] = jax.lax.dot_general(
        tile, dz_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(s == n_samples - 1)
    def _publish():
        dmu_ref[:, :] = dmu_acc[:, :]
        dsg_ref[:, :] = dsg_acc[:, :]


def _pad_inputs(mean, std, w, n_samples):
    B, L = mean.shape
    E = w.shape[1]
    lp = (-L) % _LANES
    Lp = L + lp
    mu = jnp.pad(mean.astype(jnp.float32), ((0, 0), (0, lp)))
    sg = jnp.pad(std.astype(jnp.float32), ((0, 0), (0, lp)))
    # W [K_z*L, E] -> [K_z, L, E] -> row-pad -> [K_z*Lp, E] bf16;
    # pad rows pair with sigma-pad=0 sample columns, contributing 0
    w3 = w.reshape(n_samples, L, E)
    w16 = jnp.pad(w3.astype(jnp.bfloat16),
                  ((0, 0), (0, lp), (0, 0))).reshape(n_samples * Lp, E)
    return mu, sg, w16, B, L, Lp, E


def _seed_arr(seed: jax.Array) -> jax.Array:
    return seed.reshape(2).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_sample_project(seed: jax.Array, mean: jax.Array, std: jax.Array,
                         w: jax.Array, b: jax.Array,
                         n_samples: int) -> jax.Array:
    """``z_proj(concat of n_samples reparameterized draws)`` without
    materializing the draws.

    seed: [2] int32 (from ``jax.random.key_data``); mean/std: [B, L]
    f32; w: [n_samples*L, E] (the z_proj Dense kernel); b: [E].
    Returns [B, E] bf16 — matches the Dense(compute_dtype=bf16) output.
    """
    out, _ = _fwd(seed, mean, std, w, b, n_samples)
    return out


def _fwd(seed, mean, std, w, b, n_samples):
    mu, sg, w16, B, L, Lp, E = _pad_inputs(mean, std, w, n_samples)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_samples=n_samples),
        grid=(n_samples,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, Lp), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Lp), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, E), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, E), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, E), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((B, E), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_samples * Lp * E,
            bytes_accessed=(B * Lp * 8 + n_samples * Lp * E * 2
                            + B * E * 2),
            transcendentals=n_samples * B * Lp),
    )(_seed_arr(seed), mu, sg, w16, b.astype(jnp.float32).reshape(1, -1))
    return out, (seed, mean, std, w)


def _bwd(n_samples, res, g):
    seed, mean, std, w = res
    mu, sg, w16, B, L, Lp, E = _pad_inputs(mean, std, w, n_samples)
    dz16 = g.astype(jnp.bfloat16)
    dmu, dsg, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, n_samples=n_samples),
        grid=(n_samples,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, Lp), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Lp), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, E), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, E), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, Lp), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Lp), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, E), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lp), jnp.float32),
            jax.ShapeDtypeStruct((B, Lp), jnp.float32),
            jax.ShapeDtypeStruct((n_samples * Lp, E), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, Lp), jnp.float32),
                        pltpu.VMEM((B, Lp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_samples * Lp * E,
            bytes_accessed=(B * Lp * 16 + n_samples * Lp * E * 6
                            + B * E * 2),
            transcendentals=n_samples * B * Lp),
    )(_seed_arr(seed), mu, sg, w16, dz16)
    dw = dw.reshape(n_samples, Lp, E)[:, :L, :].reshape(n_samples * L, E)
    db = jnp.sum(g.astype(jnp.float32), axis=0)
    return (None, dmu[:, :L].astype(mean.dtype),
            dsg[:, :L].astype(std.dtype), dw.astype(w.dtype),
            db.astype(w.dtype))


fused_sample_project.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
def _eps_kernel(seed_ref, eps_ref, *, n_samples: int):
    s = pl.program_id(0)
    eps_ref[:, :] = _normal_tile(seed_ref[0], seed_ref[1], s, 0,
                                 eps_ref.shape)


def sample_project_debug_eps(seed: jax.Array, B: int, L: int,
                             n_samples: int) -> jax.Array:
    """The exact eps stream the fused kernels draw, materialized
    [B, n_samples, L] — test-only, for the jnp reference comparison."""
    lp = (-L) % _LANES
    Lp = L + lp
    eps = pl.pallas_call(
        functools.partial(_eps_kernel, n_samples=n_samples),
        grid=(n_samples,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((B, Lp), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_samples * B, Lp), jnp.float32),
    )(_seed_arr(seed))
    return jnp.transpose(eps.reshape(n_samples, B, Lp)[:, :, :L],
                         (1, 0, 2))


def sample_project_xla(seed: jax.Array, mean: jax.Array, std: jax.Array,
                       w: jax.Array, b: jax.Array, n_samples: int,
                       eps: jax.Array) -> jax.Array:
    """jnp reference with EXPLICIT eps [B, n_samples, L] (use
    ``sample_project_debug_eps`` for stream parity): the Dense path's
    math — bf16 operands, f32 accumulation, one bf16 round."""
    z = (mean[:, None, :] + std[:, None, :] * eps)
    z_flat = z.reshape(z.shape[0], -1).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        z_flat, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)[None, :]
