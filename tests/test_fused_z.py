"""Fused z-sample+project kernel (ops/fused_z.py): interpreter-mode
equivalence against the explicit-eps jnp reference, VJP vs autodiff.

The on-chip PRNG primitives have no interpreter lowering, so these
tests monkeypatch ``_normal_tile`` with a deterministic pure function
of (s, shape) — the kernels' *math* (tiling, padding, accumulation,
custom VJP) is validated exactly; the real PRNG stream is validated on
TPU by benchmarks/bench_fused_z.py (moments + stream parity, PERF.md).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from vae_captioning_tpu.ops import fused_z as fz


def _fake_normal(seed0, seed1, s, tag, shape):
    r = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 37
         + jax.lax.broadcasted_iota(jnp.int32, shape, 1) * 11
         + s * 101)
    return ((r % 97).astype(jnp.float32) / 48.5) - 1.0


@pytest.fixture()
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fz.pl, "pallas_call", patched)
    monkeypatch.setattr(fz, "_normal_tile", _fake_normal)
    yield


def _problem(B=16, L=150, E=32, K=7, seed=0):
    rng = np.random.default_rng(seed)
    mean = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    std = jnp.asarray(rng.uniform(0.3, 1.5, size=(B, L)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, size=(K * L, E)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
    sd = jnp.asarray([5, 9], jnp.int32)
    return sd, mean, std, w, b, K


@pytest.mark.parametrize("L", [150, 256])
def test_forward_matches_reference(interpreted, L):
    sd, mean, std, w, b, K = _problem(L=L)
    out = fz.fused_sample_project(sd, mean, std, w, b, K)
    eps = fz.sample_project_debug_eps(sd, mean.shape[0], L, K)
    ref = fz.sample_project_xla(sd, mean, std, w, b, K, eps)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_debug_eps_deterministic(interpreted):
    sd, mean, std, w, b, K = _problem()
    e1 = fz.sample_project_debug_eps(sd, 16, 150, K)
    e2 = fz.sample_project_debug_eps(sd, 16, 150, K)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    assert e1.shape == (16, K, 150)


def test_vjp_matches_autodiff_of_reference(interpreted):
    sd, mean, std, w, b, K = _problem(seed=3)
    eps = fz.sample_project_debug_eps(sd, mean.shape[0], 150, K)
    cot = jnp.asarray(np.random.default_rng(9).normal(
        size=(mean.shape[0], w.shape[1])).astype(np.float32))

    def loss_fused(mean, std, w, b):
        return jnp.sum(fz.fused_sample_project(sd, mean, std, w, b, K)
                       .astype(jnp.float32) * cot)

    def loss_ref(mean, std, w, b):
        return jnp.sum(fz.sample_project_xla(sd, mean, std, w, b, K, eps)
                       .astype(jnp.float32) * cot)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(mean, std, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(mean, std, w, b)
    for name, a, c in zip(("dmean", "dstd", "dw", "db"), g1, g2):
        a, c = np.asarray(a), np.asarray(c)
        rel = np.abs(a - c).max() / (np.abs(c).max() + 1e-9)
        # one extra bf16 rounding on each side of the MXU ops
        assert rel < 3e-2, (name, rel)


def test_train_step_fused_z_flag_matches_plain_on_cpu():
    """The flag is TPU-gated; on CPU the step must run and match the
    plain path bit-for-bit."""
    import sys
    sys.path.insert(0, "tests")
    from test_train import make_host_batch, small_config
    from vae_captioning_tpu.train import (
        TrainState, _flatten_batch, init_model, make_optimizer,
        make_train_step)

    cfg = small_config(prior="Normal")
    cfg.fused_z = True
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    step = make_train_step(model, tx, cfg, donate=False)
    args = [jnp.asarray(x) for x in _flatten_batch(make_host_batch())]
    _, m = step(TrainState.create(params, tx), *args, jax.random.PRNGKey(1))
    cfg2 = small_config(prior="Normal")
    cfg2.fused_z = False
    model2, params2 = init_model(cfg2, jax.random.PRNGKey(0))
    step2 = make_train_step(model2, tx, cfg2, donate=False)
    _, m2 = step2(TrainState.create(params2, tx), *args,
                  jax.random.PRNGKey(1))
    assert float(m["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
