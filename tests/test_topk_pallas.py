"""Fused top-K+logsumexp kernel: XLA reference path on CPU + Pallas
kernel logic in interpreter mode (the compiled path is exercised on real
TPU by bench.py / inference)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from vae_captioning_tpu.ops import topk_pallas as tp


@pytest.fixture()
def interpreted(monkeypatch):
    """Force pallas_call into interpreter mode (no TPU needed)."""
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(tp.pl, "pallas_call", patched)
    # bypass the jit wrapper so the patched pallas_call is picked up
    monkeypatch.setattr(tp, "top_k_logsumexp_pallas",
                        tp.top_k_logsumexp_pallas.__wrapped__)
    yield


@pytest.mark.parametrize("k", [1, 3, 10])
@pytest.mark.parametrize("shape", [(8, 128), (64, 1000), (24, 300)])
def test_kernel_matches_xla(interpreted, k, shape):
    rng = np.random.default_rng(hash((k, shape)) % 2**31)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v1, i1, l1 = tp.top_k_logsumexp_pallas(x, k)
    v2, i2, l2 = tp.top_k_logsumexp_xla(x, k)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def test_kernel_tie_breaking(interpreted):
    """First-index-wins tie rule must match lax.top_k."""
    x = jnp.zeros((8, 256))
    x = x.at[:, 17].set(5.0).at[:, 99].set(5.0)
    v1, i1, _ = tp.top_k_logsumexp_pallas(x, 2)
    v2, i2 = jax.lax.top_k(x, 2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_kernel_row_padding(interpreted):
    """N not a multiple of 8 must pad and un-pad transparently."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 200)).astype(np.float32))
    v1, i1, l1 = tp.top_k_logsumexp_pallas(x, 3)
    v2, i2, l2 = tp.top_k_logsumexp_xla(x, 3)
    assert v1.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def test_dispatch_uses_xla_on_cpu():
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(8, 64)).astype(np.float32))
    v, i, l = tp.top_k_logsumexp(x, 2)  # auto: CPU backend → XLA path
    v2, i2, l2 = tp.top_k_logsumexp_xla(x, 2)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_beam_search_use_pallas_flag_consistency():
    """beam_search(use_pallas=False) must equal the default on CPU."""
    import sys
    sys.path.insert(0, "tests")
    from test_decoding import make_step_fn, BOS, EOS
    from vae_captioning_tpu.ops.decoding import beam_search
    step_fn = make_step_fn(seed=4)
    init = jnp.zeros((2, 6))
    a = beam_search(step_fn, init, 2, beam_size=3, bos_id=BOS, eos_id=EOS,
                    max_len=6, use_pallas=False)
    b = beam_search(step_fn, init, 2, beam_size=3, bos_id=BOS, eos_id=EOS,
                    max_len=6)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
