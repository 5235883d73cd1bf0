"""Fused teacher-forcing LSTM sequence kernel (ops/fused_lstm_seq):
interpreter-mode forward equivalence against the XLA reference, masked
(dynamic_rnn) semantics, row-padding paths, and custom-VJP gradient
validation against jax.grad of the reference scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from vae_captioning_tpu.ops import fused_lstm_seq as fls


@pytest.fixture()
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fls.pl, "pallas_call", patched)
    yield fls.fused_lstm_seq


def _inputs(T, B, E, H, seed=0, full_lengths=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32))
    wx = jnp.asarray(rng.normal(0, 0.3, size=(E, 4 * H)).astype(np.float32))
    wh = jnp.asarray(rng.normal(0, 0.3, size=(H, 4 * H)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, size=(4 * H,)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    if full_lengths:
        lengths = np.full(B, T, np.int32)
    else:
        lengths = rng.integers(1, T + 1, size=B).astype(np.int32)
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])  # [B, T]
    return x, wx, wh, b, c0, h0, mask


@pytest.mark.parametrize("shape", [
    (5, 128, 128, 128),     # exact single block
    (7, 300, 256, 128),     # row padding (300 -> 512)
    (3, 64, 128, 256),      # rows below the 128 floor
])
def test_forward_matches_xla(interpreted, shape):
    T, B, E, H = shape
    x, wx, wh, b, c0, h0, mask = _inputs(*shape, seed=sum(shape))
    (ct, ht), hs = interpreted(x, wx, wh, b, c0, h0, mask)
    (ct2, ht2), hs2 = fls.fused_lstm_seq_xla(x, wx, wh, b, c0, h0, mask)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs2),
                               rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(ct2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(ht2),
                               rtol=1e-4, atol=1e-4)


def test_masked_rows_pass_state_through(interpreted):
    T, B, E, H = 6, 128, 128, 128
    x, wx, wh, b, c0, h0, _ = _inputs(T, B, E, H, seed=1)
    lengths = np.full(B, 3, np.int32)
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    (ct, ht), hs = interpreted(x, wx, wh, b, c0, h0, mask)
    # outputs at t >= length are exactly zero
    assert np.all(np.asarray(hs)[3:] == 0.0)
    # final state equals the state at t = length - 1: running only the
    # first 3 steps must give the same (c, h)
    (ct3, ht3), _ = interpreted(x[:3], wx, wh, b, c0, h0, mask[:, :3])
    np.testing.assert_allclose(np.asarray(ct), np.asarray(ct3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(ht3), atol=1e-6)


def test_gradients_match_reference_autodiff(interpreted):
    """Custom-VJP grads vs jax.grad of the XLA reference — same scalar
    loss touching hs, c_T and h_T, all differentiable inputs."""
    T, B, E, H = 4, 128, 128, 128
    x, wx, wh, b, c0, h0, mask = _inputs(T, B, E, H, seed=7)
    rng = np.random.default_rng(11)
    w_hs = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    w_c = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    def loss_kernel(x, wx, wh, b, c0, h0):
        (ct, ht), hs = interpreted(x, wx, wh, b, c0, h0, mask)
        return (jnp.sum(hs.astype(jnp.float32) * w_hs)
                + jnp.sum(ct * w_c) + jnp.sum(ht * w_c))

    def loss_ref(x, wx, wh, b, c0, h0):
        (ct, ht), hs = fls.fused_lstm_seq_xla(x, wx, wh, b, c0, h0, mask)
        return (jnp.sum(hs.astype(jnp.float32) * w_hs)
                + jnp.sum(ct * w_c) + jnp.sum(ht * w_c))

    args = (x, wx, wh, b, c0, h0)
    g_k = jax.grad(loss_kernel, argnums=tuple(range(6)))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ["x", "wx", "wh", "b", "c0", "h0"]
    for n, a, r in zip(names, g_k, g_r):
        a, r = np.asarray(a), np.asarray(r)
        scale = np.abs(r).max() + 1e-6
        # bf16 residues (saved gate activations / h stack) vs the
        # reference autodiff's f32 residues → ~1% relative tolerance
        np.testing.assert_allclose(a / scale, r / scale, atol=2e-2,
                                   err_msg=f"grad mismatch for {n}")


def test_gradient_of_masked_steps_is_zero(interpreted):
    T, B, E, H = 5, 128, 128, 128
    x, wx, wh, b, c0, h0, _ = _inputs(T, B, E, H, seed=3)
    lengths = np.full(B, 2, np.int32)
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])

    def loss(x):
        _, hs = interpreted(x, wx, wh, b, c0, h0, mask)
        return jnp.sum(hs.astype(jnp.float32) ** 2)

    g = np.asarray(jax.grad(loss)(x))
    assert np.all(g[2:] == 0.0), "masked timesteps must get zero dx"
    assert np.abs(g[:2]).max() > 0.0


def test_model_integration_cpu_interpret(monkeypatch):
    """CVAEModel with use_fused_seq=True (interpret mode) reproduces the
    scan path's loss to bf16 tolerance."""
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fls.pl, "pallas_call", patched)

    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.models.cvae import CVAEModel, compute_loss
    from vae_captioning_tpu.train import init_model
    from vae_captioning_tpu.ops import distributions as dist

    cfg = Config(prior="AG", use_c_v=True)
    cfg.vocab_size = 130
    # embed/hidden must be lane-aligned for the kernel: use 128
    cfg.embed_size = 128
    cfg.encoder_hidden = 128
    cfg.decoder_hidden = 128
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, K, T = 2, 2, 6
    feats = jnp.asarray(rng.normal(size=(B, cfg.cnn_feature_size))
                        .astype(np.float32))
    enc = jnp.asarray(rng.integers(1, 130, size=(B * K, T)).astype(np.int32))
    dec = jnp.asarray(rng.integers(1, 130, size=(B * K, T)).astype(np.int32))
    lens = jnp.asarray(rng.integers(2, T, size=(B * K,)).astype(np.int32))
    cv = rng.random((B, cfg.num_clusters)).astype(np.float32)
    cv = jnp.asarray(cv / cv.sum(-1, keepdims=True))
    cm = jnp.asarray(dist.init_cluster_means(cfg.num_clusters,
                                             cfg.latent_size, cfg.seed))
    rngs = {"z": jax.random.PRNGKey(3), "sample": jax.random.PRNGKey(4)}

    fused = CVAEModel.from_config(cfg).clone(use_fused_seq=True)
    plain = CVAEModel.from_config(cfg).clone(use_fused_seq=False)
    out_f = fused.apply({"params": params}, feats, enc, dec, lens, cv,
                        rngs=rngs, time_major=True)
    out_p = plain.apply({"params": params}, feats, enc, dec, lens, cv,
                        rngs=rngs, time_major=True)
    l_f = compute_loss(out_f, enc.T, prior="AG", no_encoder=False,
                       cluster_means=cm, time_major=True)
    l_p = compute_loss(out_p, enc.T, prior="AG", no_encoder=False,
                       cluster_means=cm, time_major=True)
    assert abs(float(l_f["rec_loss"]) - float(l_p["rec_loss"])) < 5e-2
    assert abs(float(l_f["kld"]) - float(l_p["kld"])) / (
        abs(float(l_p["kld"])) + 1e-6) < 5e-3


def test_debug_mask_check_rejects_non_monotone(interpreted, monkeypatch):
    """ADVICE r3: the fused backward silently mis-computes dWh/dh for
    non-lengths-derived masks; the opt-in debug check must catch them."""
    monkeypatch.setattr(fls, "DEBUG_MASK_CHECK", True)
    T, B, E, H = 4, 8, 128, 128
    x, wx, wh, b, c0, h0, mask = _inputs(T, B, E, H, seed=5)
    interpreted(x, wx, wh, b, c0, h0, mask)  # lengths-derived mask: fine

    bad = np.asarray(mask).copy()
    bad[0] = [True, False, True, False]  # 0→1 step: non-monotone
    with pytest.raises(Exception, match="non-monotone"):
        interpreted(x, wx, wh, b, c0, h0, jnp.asarray(bad))


def test_assert_monotone_mask_unit():
    ok = np.array([[1, 1, 0, 0], [1, 1, 1, 1], [1, 0, 0, 0]], bool)
    fls._assert_monotone_mask(ok)
    bad = np.array([[1, 0, 1, 0]], bool)
    with pytest.raises(ValueError, match="non-monotone"):
        fls._assert_monotone_mask(bad)
