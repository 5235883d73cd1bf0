"""Fused matmul+top-K+logsumexp kernel: interpreter-mode equivalence,
padding paths, and beam_search integration via step_topk_fn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from vae_captioning_tpu.ops import fused_logits_topk as fl


@pytest.fixture()
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fl.pl, "pallas_call", patched)
    yield fl.fused_logits_top_k.__wrapped__  # un-jitted so the patch applies


@pytest.mark.parametrize("shape_k", [
    ((256, 64, 3840), 3),     # exact block multiples
    ((300, 64, 4000), 5),     # row + vocab padding
    ((8, 32, 7680), 1),       # multi-tile vocab, tiny rows
    ((512, 128, 4096), 10),   # k = reference beam size
])
def test_fused_matches_xla(interpreted, shape_k):
    (M, H, V), k = shape_k
    rng = np.random.default_rng(M + V + k)
    h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    v1, i1, l1 = interpreted(h, w, b, k)
    v2, i2, l2 = fl.fused_logits_top_k_xla(h, w, b, k)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)


def test_fused_bias_matters(interpreted):
    """The bias must flow into both the top-k selection and the lse."""
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.zeros((32, 3840), jnp.float32)
    b = np.zeros(3840, np.float32)
    b[7] = 5.0
    b[100] = 4.0
    v, i, l = interpreted(h, w, jnp.asarray(b), 2)
    assert (np.asarray(i[:, 0]) == 7).all()
    assert (np.asarray(i[:, 1]) == 100).all()
    want_lse = float(jax.scipy.special.logsumexp(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(l), want_lse, rtol=1e-5)


def test_beam_search_with_step_topk_fn():
    """beam_search(step_topk_fn=...) must equal the plain logits path."""
    import sys
    sys.path.insert(0, "tests")
    from test_decoding import BOS, EOS, V
    from vae_captioning_tpu.ops.decoding import beam_search

    rng = np.random.default_rng(3)
    H = 8
    W_tok = jnp.asarray(rng.normal(0, 1.0, (V, H)).astype(np.float32))
    W_out = jnp.asarray(rng.normal(0, 1.5, (H, V)).astype(np.float32))
    b_out = jnp.asarray(rng.normal(0, 0.5, (V,)).astype(np.float32))
    W_h = jnp.asarray(rng.normal(0, 0.7, (H, H)).astype(np.float32))

    def hidden_fn(carry, tokens):
        return jnp.tanh(carry @ W_h + W_tok[tokens])

    def step_fn(carry, tokens):
        h = hidden_fn(carry, tokens)
        # bf16 matmul to match the fused path's precision
        logits = jax.lax.dot_general(
            h.astype(jnp.bfloat16), W_out.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_out[None, :]
        return h, logits

    def step_topk_fn(carry, tokens):
        h = hidden_fn(carry, tokens)
        vals, idx, lse = fl.fused_logits_top_k_xla(h, W_out, b_out, 3)
        return h, vals, idx, lse

    init = jnp.asarray(rng.normal(0, 1, (4, H)).astype(np.float32))
    kw = dict(beam_size=3, bos_id=BOS, eos_id=EOS, max_len=8)
    a = beam_search(step_fn, init, 4, **kw)
    b = beam_search(step_fn, init, 4, step_topk_fn=step_topk_fn, **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=1e-5)


def test_fused_tie_break_earliest_column(interpreted):
    """Exact-tie semantics across 128-lane groups: equal logit values
    must resolve to the EARLIEST vocab index (lax.top_k rule), which the
    two-level group extraction preserves via group-index tie-break."""
    M, H, V = 8, 32, 3840
    h = jnp.ones((M, H), jnp.float32)
    w = jnp.zeros((H, V), jnp.float32)
    b = np.zeros(V, np.float32)
    # the same top value planted in three different 128-lane groups,
    # plus a second value tied twice
    b[5] = 9.0
    b[700] = 9.0
    b[2900] = 9.0
    b[130] = 7.0
    b[131] = 7.0
    v, i, l = interpreted(h, w, jnp.asarray(b), 5)
    v2, i2, l2 = fl.fused_logits_top_k_xla(h, w, jnp.asarray(b), 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(i[0]),
                                  np.asarray([5, 700, 2900, 130, 131]))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), rtol=1e-5)


# ---------------------------------------------------------------- int8

@pytest.mark.parametrize("shape_k", [
    ((256, 64, 3840), 3),
    ((300, 128, 4000), 5),
])
def test_int8_kernel_matches_int8_xla(interpreted_int8, shape_k):
    """The int8 kernel must reproduce its XLA reference exactly (same
    quantized math; only the tile folding is kernel-side)."""
    (M, H, V), k = shape_k
    rng = np.random.default_rng(M + k)
    h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    wq, ws = fl.quantize_logits_weights(w)
    v1, i1, l1 = interpreted_int8(h, wq, ws, b, k)
    v2, i2, l2 = fl.fused_logits_top_k_int8_xla(h, wq, ws, b, k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)


@pytest.fixture()
def interpreted_int8(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fl.pl, "pallas_call", patched)
    yield fl.fused_logits_top_k_int8.__wrapped__


def test_int8_agreement_with_exact_path():
    """Quantization is approximate by design; on a random logits head
    the int8 top-1 must agree with the exact path wherever the top-2
    margin exceeds the quantization error bound, and overall top-1
    agreement should be high."""
    M, H, V, k = 128, 64, 1000, 3
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.5, size=(H, V)).astype(np.float32))
    b = jnp.zeros((V,), jnp.float32)
    exact_v, exact_i, _ = fl.fused_logits_top_k_xla(h, w, b, 2)
    wq, ws = fl.quantize_logits_weights(w)
    q_v, q_i, _ = fl.fused_logits_top_k_int8_xla(h, wq, ws, b, k)
    agree = np.asarray(exact_i[:, 0]) == np.asarray(q_i[:, 0])
    # error bound: |Δlogit| ≤ |h|₁-weighted quantization steps; use an
    # empirical proxy — where the exact top-2 margin is large, must agree
    margin = np.asarray(exact_v[:, 0] - exact_v[:, 1])
    big_margin = margin > 0.05 * np.abs(np.asarray(exact_v[:, 0]))
    assert agree[big_margin].all(), "int8 flipped a well-separated top-1"
    assert agree.mean() > 0.9, f"top-1 agreement only {agree.mean():.2f}"
