"""Fused LSTM decode-step kernel: interpreter-mode equivalence against
the XLA reference, padding paths, gather correctness, and structural
parity of the XLA reference with the production Decoder.step_hidden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from vae_captioning_tpu.ops import fused_lstm_step as fs


@pytest.fixture()
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fs.pl, "pallas_call", patched)
    yield fs.fused_lstm_step.__wrapped__  # un-jitted so the patch applies


def _random_step_inputs(M, H, E, V, seed=0):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, V, size=M).astype(np.int32))
    c = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    embed = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(0, 0.3, size=(E + H, 4 * H)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, size=(4 * H,)).astype(np.float32))
    return tokens, c, h, embed, w, b


@pytest.mark.parametrize("shape", [
    (128, 64, 32, 512),    # exact block multiple, aligned vocab
    (200, 128, 64, 250),   # row padding + vocab sublane padding
    (8, 256, 128, 77),     # tiny rows, odd vocab
])
def test_fused_matches_xla(interpreted, shape):
    M, H, E, V = shape
    args = _random_step_inputs(M, H, E, V, seed=sum(shape))
    nc1, nh1 = interpreted(*args, forget_bias=1.0)
    nc2, nh2 = fs.fused_lstm_step_xla(*args, forget_bias=1.0)
    assert nc1.shape == (M, H) and nh1.shape == (M, H)
    np.testing.assert_allclose(np.asarray(nc1), np.asarray(nc2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nh1), np.asarray(nh2),
                               rtol=1e-5, atol=1e-5)


def test_gather_uses_token_rows(interpreted):
    """Each lane must read exactly its token's embedding row: with W_x
    = identity-ish and zero recurrent weights, distinct tokens must give
    distinct, token-determined gates."""
    M, H, E, V = 16, 32, 32, 40
    rng = np.random.default_rng(1)
    embed = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32))
    # only the input-gate block of W_x nonzero; h rows zeroed out
    w = np.zeros((E + H, 4 * H), np.float32)
    w[:E, :H] = np.eye(E, H)
    tokens = jnp.asarray(np.arange(M, dtype=np.int32) * 2)
    c = jnp.zeros((M, H), jnp.float32)
    h = jnp.zeros((M, H), jnp.float32)
    b = jnp.zeros((4 * H,), jnp.float32)
    nc, _ = interpreted(tokens, c, h, embed, jnp.asarray(w), b,
                        forget_bias=1.0)
    # new_c = sigmoid(i_gate)*tanh(0)=0? No: g gate is 0 → tanh(0)=0, so
    # drive the g block instead to see the gather.
    w2 = np.zeros((E + H, 4 * H), np.float32)
    w2[:E, 2 * H:3 * H] = np.eye(E, H)          # g gate = x @ I
    nc2, _ = interpreted(tokens, c, h, embed, jnp.asarray(w2), b,
                         forget_bias=1.0)
    want = (jax.nn.sigmoid(jnp.zeros((M, H)))
            * jnp.tanh(embed.astype(jnp.bfloat16).astype(jnp.float32)
                       [tokens, :H]))
    np.testing.assert_allclose(np.asarray(nc2), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert not np.allclose(np.asarray(nc2[0]), np.asarray(nc2[1]))


def test_xla_reference_matches_production_step():
    """fused_lstm_step_xla must reproduce Decoder.step_hidden's LSTM math
    exactly (same bf16/f32 structure) — it is the contract the kernel is
    tested against."""
    from vae_captioning_tpu.models.decoder import Decoder

    M, V, E, H = 6, 50, 16, 24
    dec = Decoder(vocab_size=V, embed_size=E, hidden_size=H,
                  compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    params = dec.init(jax.random.PRNGKey(0),
                      ((jnp.zeros((M, H)), jnp.zeros((M, H))),),
                      jnp.zeros((M,), jnp.int32), method=Decoder.step)
    c = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, V, M).astype(np.int32))

    carry, hidden = dec.apply(params, ((c, h),), tokens,
                              method=Decoder.step_hidden)
    p = params["params"]
    nc, nh = fs.fused_lstm_step_xla(
        tokens, c, h, p["dec_embeddings"]["embedding"],
        p["lstm"]["cell_0"]["kernel"], p["lstm"]["cell_0"]["bias"])
    np.testing.assert_array_equal(np.asarray(carry[0][0]), np.asarray(nc))
    np.testing.assert_array_equal(np.asarray(hidden), np.asarray(nh))


def test_greedy_decode_identical_with_fused_step(interpreted):
    """sample_decode driven by the fused LSTM step (interpreted kernel)
    must emit the same tokens as the plain Decoder path."""
    from vae_captioning_tpu.models.decoder import Decoder
    from vae_captioning_tpu.ops.decoding import sample_decode

    M, V, E, H = 4, 30, 16, 24
    dec = Decoder(vocab_size=V, embed_size=E, hidden_size=H,
                  compute_dtype=jnp.bfloat16)
    params = dec.init(jax.random.PRNGKey(1),
                      ((jnp.zeros((M, H)), jnp.zeros((M, H))),),
                      jnp.zeros((M,), jnp.int32), method=Decoder.step)
    rng = np.random.default_rng(3)
    c0 = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    p = params["params"]
    emb = p["dec_embeddings"]["embedding"]
    kern = p["lstm"]["cell_0"]["kernel"]
    kbias = p["lstm"]["cell_0"]["bias"]

    def plain_step(carry, tokens):
        return dec.apply(params, carry, tokens, method=Decoder.step)

    def fused_step(carry, tokens):
        ((c, h),) = carry
        nc, nh = interpreted(tokens, c, h, emb, kern, kbias,
                             forget_bias=1.0)
        logits = dec.apply(params, nh, method=lambda m, x: m.logits_head(x))
        return ((nc, nh),), logits.astype(jnp.float32)

    kw = dict(bos_id=1, eos_id=2, max_len=6)
    a = sample_decode(plain_step, ((c0, h0),), M, **kw)
    b = sample_decode(fused_step, ((c0, h0),), M, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
