"""Fused AG heads+combine kernel (ops/fused_ag_heads.py): forward/grad
parity vs the jnp reference in interpreter mode, geometry edge cases
(multi-group, cluster pad, row-tile pad), and the dp shard_map wrapper
on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.sharding import Mesh

import vae_captioning_tpu.ops.fused_ag_heads as fah
from vae_captioning_tpu.parallel import kernel_shard as ks


@pytest.fixture()
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fah.pl, "pallas_call", patched)
    yield


def _problem(B=48, H=64, K=7, L=150, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, size=(H, 2 * K * L))
                    .astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, size=(2 * K * L,))
                    .astype(np.float32))
    cv = rng.random((B, K)).astype(np.float32)
    cv = jnp.asarray(cv / cv.sum(-1, keepdims=True))
    return h, w, b, cv


# the kernel rounds PRODUCTS to bf16 before its fold contractions while
# the reference rounds factors — both one-bf16-round (2⁻⁸) error class
_REL = 6e-3


def _loss(fn, h, w, b, cv):
    m, s = fn(h, w, b, cv)
    return jnp.sum(m ** 2) + jnp.sum(jnp.log(s + 1e-6) ** 2)


@pytest.mark.parametrize("dims", [
    dict(B=48, H=64, K=7, L=150),    # single group, single row tile
    dict(B=48, H=64, K=12, L=150),   # two groups + cluster pad (Kp=16)
    dict(B=520, H=64, K=7, L=150),   # row tiling with B % 256 != 0
    dict(B=32, H=64, K=5, L=37),     # odd latent width
])
def test_fwd_and_grads_match_reference(interpreted, dims):
    args = _problem(**dims)
    m1, s1 = fah.fused_ag_heads(*args)
    m2, s2 = fah.ag_heads_xla(*args)
    assert m1.shape == m2.shape == (dims["B"], dims["L"])
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=0, atol=_REL * float(jnp.abs(m2).max()))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=0, atol=_REL * float(jnp.abs(s2).max()))

    g1 = jax.grad(lambda *a: _loss(fah.fused_ag_heads, *a),
                  argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(lambda *a: _loss(fah.ag_heads_xla, *a),
                  argnums=(0, 1, 2, 3))(*args)
    for name, a, e in zip(["dh", "dw", "db", "dcv"], g1, g2):
        a, e = np.asarray(a), np.asarray(e)
        rel = np.abs(a - e).max() / (np.abs(e).max() + 1e-9)
        assert rel < _REL, (name, rel)
        assert a.shape == e.shape


def test_matches_encoder_math(interpreted):
    """Against the INCUMBENT f32 encoder formulation (models/encoder.py
    AG branch) — the kernel may differ only by bf16-class rounding."""
    h, w, b, cv = _problem(seed=3)
    K, L = 7, 150
    q = h @ w + b[None, :]
    means = q[:, :K * L].reshape(-1, K, L)
    stds = jnp.exp(q[:, K * L:]).reshape(-1, K, L)
    mean = jnp.einsum("bk,bkl->bl", cv, means)
    std = jnp.einsum("bk,bkl->bl", cv, stds)
    m1, s1 = fah.fused_ag_heads(h, w, b, cv)
    assert float(jnp.abs(m1 - mean).max() / jnp.abs(mean).max()) < 2e-2
    assert float(jnp.abs(s1 - std).max() / jnp.abs(std).max()) < 2e-2


def test_sharded_matches_single(interpreted):
    devices = jax.devices()[:8]
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices), ("dp",))
    h, w, b, cv = _problem(B=64, seed=4)
    m0, s0 = fah.fused_ag_heads(h, w, b, cv)
    with ks.dp_mesh(mesh):
        m1, s1 = ks.ag_heads(h, w, b, cv)
    # row-independent kernel: per-row math identical -> bit-equal
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_sharded_grads_match_single(interpreted):
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices), ("dp",))
    h, w, b, cv = _problem(B=64, seed=5)
    g0 = jax.grad(lambda *a: _loss(fah.fused_ag_heads, *a),
                  argnums=(0, 1, 2, 3))(h, w, b, cv)
    with ks.dp_mesh(mesh):
        g1 = jax.grad(lambda *a: _loss(ks.ag_heads, *a),
                      argnums=(0, 1, 2, 3))(h, w, b, cv)
    # dh/dcv row-local (bit-equal); dw/db psum 8 f32 partials
    np.testing.assert_array_equal(np.asarray(g0[0]), np.asarray(g1[0]))
    np.testing.assert_array_equal(np.asarray(g0[3]), np.asarray(g1[3]))
    for a, e in zip(g1[1:3], g0[1:3]):
        scale = np.abs(np.asarray(e)).max() + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(e) / scale, atol=1e-6)


def test_train_step_trajectory_parity(interpreted):
    """3 real train steps with fused_heads on/off: loss curves agree to
    bf16-kernel tolerance (same stance as the fused-LSTM trajectory
    test)."""
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.train import (TrainState, init_model,
                                          make_optimizer, make_train_step)

    def run(fused):
        cfg = Config(prior="AG", use_c_v=True, fused_heads=fused,
                     fused_force=fused)
        cfg.vocab_size = 97
        cfg.encoder_hidden = cfg.decoder_hidden = 32
        cfg.embed_size = 24
        cfg.latent_size = 150
        cfg.num_clusters = 6
        cfg.gen_z_samples = 3
        # isolate the heads change: keep the other TPU-gated kernels off
        cfg.fused_lstm_seq = False
        cfg.fused_z = False
        model, params = init_model(cfg, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, cfg, donate=False)
        rng = np.random.default_rng(0)
        B, K, T = 8, 2, 6
        feats = jnp.asarray(rng.normal(size=(B, cfg.cnn_feature_size))
                            .astype(np.float32))
        labels = jnp.asarray(rng.integers(1, 97, size=(B * K, T))
                             .astype(np.int32))
        dec = jnp.asarray(rng.integers(1, 97, size=(B * K, T))
                          .astype(np.int32))
        lens = jnp.asarray(np.full(B * K, T - 1, np.int32))
        cv = rng.random((B, cfg.num_clusters)).astype(np.float32)
        cv = jnp.asarray(cv / cv.sum(-1, keepdims=True))
        losses = []
        key = jax.random.PRNGKey(7)
        for i in range(3):
            state, m = step(state, feats, labels, dec, lens, cv,
                            jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    la = run(False)
    lb = run(True)
    np.testing.assert_allclose(la, lb, rtol=2e-3)
