"""Correctness of the round-4 top-K extraction/merge CANDIDATES in the
A/B harness (benchmarks/bench_topk_variants.py, VERDICT r3 #5):
``bitonic_merge`` (bitonic network replaces the k-pass running merge)
and ``threshold_skip`` (tiles provably below every row's k-th value
skip extraction+merge).  Both must be bit-identical to the XLA
reference, including tie-breaks, before any TPU timing means anything.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

import bench_topk_variants as btv  # noqa: E402

from vae_captioning_tpu.ops.fused_logits_topk import (  # noqa: E402
    fused_logits_top_k_xla)


@pytest.fixture()
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(btv.pl, "pallas_call", patched)
    yield


def _problem(M=256, H=128, V=3000, peaked=False, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.05)
    b = rng.normal(size=(V,)).astype(np.float32) * 0.01
    if peaked:
        b = b + 8.0 / np.sqrt(1.0 + np.arange(V, dtype=np.float32))
    return h, w, jnp.asarray(b)


@pytest.mark.parametrize("mode", ["bitonic_merge", "threshold_skip"])
@pytest.mark.parametrize("peaked", [False, True])
@pytest.mark.parametrize("k", [5, 10])
def test_variant_bit_identical(interpreted, mode, peaked, k):
    h, w, b = _problem(peaked=peaked)
    want_v, want_i, want_lse = map(np.asarray,
                                   fused_logits_top_k_xla(h, w, b, k))
    got_v, got_i, got_lse = map(np.asarray,
                                btv.fused_topk_variant(h, w, b, k, mode))
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_v, want_v)
    np.testing.assert_allclose(got_lse, want_lse, atol=1e-5)


def test_bitonic_merge_unit_ties():
    """The network must keep the (value desc, index asc) tie-break the
    production merge uses."""
    av = jnp.asarray([[5.0, 3.0, 3.0, 1.0, 0.5]])
    ai = jnp.asarray([[2, 7, 9, 11, 30]], dtype=jnp.int32)
    bv = jnp.asarray([[4.0, 3.0, 1.0, 1.0, -2.0]])
    bi = jnp.asarray([[4, 5, 6, 12, 40]], dtype=jnp.int32)
    mv, mi = btv._bitonic_merge_sorted(av, ai, bv, bi, 5)
    np.testing.assert_array_equal(np.asarray(mv)[0],
                                  [5.0, 4.0, 3.0, 3.0, 3.0])
    # ties at 3.0: indices 5, 7, 9 in ascending order
    np.testing.assert_array_equal(np.asarray(mi)[0], [2, 4, 5, 7, 9])
