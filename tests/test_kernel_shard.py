"""Partition tests: the train-path Pallas kernels under shard_map on the
8-virtual-device CPU mesh (VERDICT r3 #2 / NEXT r3 item 6).

Interpret mode runs the REAL kernel bodies per shard; the wrappers in
parallel/kernel_shard.py are exactly what a multi-chip TPU run executes,
so these tests pin (a) that the sharded fused path compiles and runs on
a >1-device mesh, (b) value parity with the single-device kernels for
the deterministic ones (LSTM sequence exactly, CE up to f32 psum
reassociation), (c) gradient parity — including the psum of dW/db
cotangents for the replicated weight operands — and (d) shard-distinct
PRNG seed mixing for fused_z.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.sharding import Mesh

from vae_captioning_tpu.ops import fused_ce as fce
from vae_captioning_tpu.ops import fused_lstm_seq as fls
from vae_captioning_tpu.ops import fused_z as fz
from vae_captioning_tpu.parallel import kernel_shard as ks


@pytest.fixture()
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    # every kernel module shares the same `pl` module object
    monkeypatch.setattr(fls.pl, "pallas_call", patched)
    yield


@pytest.fixture()
def mesh8():
    devices = jax.devices()[:8]
    assert len(devices) == 8, "conftest must provide 8 virtual CPU devices"
    return Mesh(np.asarray(devices), ("dp",))


@pytest.fixture(autouse=True)
def _clear_mesh():
    yield
    ks.set_dp_mesh(None)


def _lstm_inputs(T=6, B=16, E=128, H=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, B, E)).astype(np.float32))
    wx = jnp.asarray(rng.normal(0, 0.3, size=(E, 4 * H)).astype(np.float32))
    wh = jnp.asarray(rng.normal(0, 0.3, size=(H, 4 * H)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, size=(4 * H,)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    lengths = rng.integers(1, T + 1, size=B).astype(np.int32)
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    return x, wx, wh, b, c0, h0, mask


def test_kernel_path_reporting(mesh8):
    assert ks.kernel_path("any") == "single"
    with ks.dp_mesh(mesh8):
        assert ks.kernel_path("any") == "sharded"
    assert ks.kernel_path("any") == "single"
    # a 1-device mesh is a passthrough too
    with ks.dp_mesh(Mesh(np.asarray(jax.devices()[:1]), ("dp",))):
        assert ks.kernel_path("any") == "single"


def test_lstm_seq_sharded_matches_single(interpreted, mesh8):
    args = _lstm_inputs()
    (ct0, ht0), hs0 = fls.fused_lstm_seq(*args)
    with ks.dp_mesh(mesh8):
        (ct1, ht1), hs1 = ks.lstm_seq(*args)
    # row-independent kernel: per-row math identical -> bit-equal
    np.testing.assert_array_equal(np.asarray(ct0), np.asarray(ct1))
    np.testing.assert_array_equal(np.asarray(ht0), np.asarray(ht1))
    np.testing.assert_array_equal(np.asarray(hs0), np.asarray(hs1))


def test_lstm_seq_sharded_grads_match_single(interpreted, mesh8):
    x, wx, wh, b, c0, h0, mask = _lstm_inputs(T=4, B=16)

    def loss(fn, x, wx, wh, b):
        (ct, ht), hs = fn(x, wx, wh, b, c0, h0, mask)
        return (jnp.sum(hs.astype(jnp.float32) ** 2) + jnp.sum(ct ** 2)
                + jnp.sum(ht ** 2))

    g0 = jax.grad(lambda *a: loss(fls.fused_lstm_seq, *a),
                  argnums=(0, 1, 2, 3))(x, wx, wh, b)
    with ks.dp_mesh(mesh8):
        g1 = jax.grad(lambda *a: loss(ks.lstm_seq, *a),
                      argnums=(0, 1, 2, 3))(x, wx, wh, b)
    # dx is row-local (bit-equal); dwx/dwh/db psum 8 f32 partials whose
    # single-device counterpart is one big row accumulation -> tiny
    # reassociation tolerance
    np.testing.assert_array_equal(np.asarray(g0[0]), np.asarray(g1[0]))
    for a, e in zip(g1[1:], g0[1:]):
        scale = np.abs(np.asarray(e)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(e) / scale, atol=1e-5)


@pytest.mark.parametrize("impl", [fce.fused_linear_ce,
                                  fce.fused_linear_ce_hybrid])
def test_linear_ce_sharded_matches_single(interpreted, mesh8, impl):
    rng = np.random.default_rng(1)
    T, BK, H, V = 4, 16, 128, 256
    hidden = jnp.asarray(rng.normal(size=(T, BK, H)).astype(np.float32)
                         ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, size=(H, V)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, size=(V,)).astype(np.float32))
    labels = rng.integers(0, V, size=(T, BK)).astype(np.int32)
    labels[-1, :] = 0  # PAD tail
    labels = jnp.asarray(labels)

    loss0 = ks.linear_ce(impl, hidden, w, b, labels, batch_axis=1)
    with ks.dp_mesh(mesh8):
        loss1 = ks.linear_ce(impl, hidden, w, b, labels, batch_axis=1)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)

    def loss_fn(hidden, w, b):
        return ks.linear_ce(impl, hidden, w, b, labels, batch_axis=1)

    g0 = jax.grad(loss_fn, argnums=(0, 1, 2))(hidden, w, b)
    with ks.dp_mesh(mesh8):
        g1 = jax.grad(loss_fn, argnums=(0, 1, 2))(hidden, w, b)
    for a, e in zip(g1, g0):
        a, e = np.asarray(a, np.float32), np.asarray(e, np.float32)
        scale = np.abs(e).max() + 1e-6
        np.testing.assert_allclose(a / scale, e / scale, atol=2e-5)


def test_sample_project_shard_seeds_distinct(mesh8, monkeypatch):
    """Each shard must fold its axis_index into the PRNG seed — without
    it all 8 shards would draw the SAME noise block for different rows."""
    seen = jnp.asarray([3, 9], jnp.int32)

    def fake(seed, mean, std, w, b, n_samples):
        # expose the (mixed) seed word in the output rows
        val = (seed[0] & 0x7FFF).astype(jnp.float32)
        return jnp.full((mean.shape[0], w.shape[1]), val, jnp.float32)

    monkeypatch.setattr(fz, "fused_sample_project", fake)
    B, L, E, K = 16, 8, 4, 3
    mean = jnp.zeros((B, L), jnp.float32)
    std = jnp.ones((B, L), jnp.float32)
    w = jnp.zeros((K * L, E), jnp.float32)
    b = jnp.zeros((E,), jnp.float32)
    with ks.dp_mesh(mesh8):
        out = np.asarray(ks.sample_project(seen, mean, std, w, b, K))
    per_shard = out[::2, 0]  # 2 rows per shard, constant within a shard
    assert len(set(per_shard.tolist())) == 8, per_shard
    # and the mixing formula matches the implementation's documented one
    # (int32 wraparound done in python ints to avoid numpy overflow warns)
    def mix32(i):
        v = ((i + 1) * -1640531527) & 0xFFFFFFFF
        return v - 0x100000000 if v >= 0x80000000 else v

    expected = [(3 ^ mix32(i)) & 0x7FFF for i in range(8)]
    np.testing.assert_array_equal(per_shard, np.asarray(expected, np.float32))


def test_sample_project_sharded_math(interpreted, mesh8, monkeypatch):
    """With the deterministic fake noise (same as test_fused_z), the
    sharded wrapper must equal the direct kernel run shard-by-shard."""
    from test_fused_z import _fake_normal
    monkeypatch.setattr(fz, "_normal_tile", _fake_normal)
    rng = np.random.default_rng(2)
    B, L, E, K = 16, 150, 32, 3
    mean = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    std = jnp.asarray(rng.uniform(0.3, 1.5, size=(B, L)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, size=(K * L, E)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
    seed = jnp.asarray([5, 9], jnp.int32)

    with ks.dp_mesh(mesh8):
        out = np.asarray(ks.sample_project(seed, mean, std, w, b, K))
        # grads flow through the sharded custom-VJP path
        g = jax.grad(lambda m: jnp.sum(ks.sample_project(
            seed, m, std, w, b, K).astype(jnp.float32)))(mean)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0

    def mix32(i):
        v = ((i + 1) * -1640531527) & 0xFFFFFFFF
        return v - 0x100000000 if v >= 0x80000000 else v

    rows = B // 8
    for k in range(8):
        mixed = seed.at[0].set(seed[0] ^ jnp.int32(mix32(k)))
        ref = np.asarray(fz.fused_sample_project(
            mixed, mean[k * rows:(k + 1) * rows],
            std[k * rows:(k + 1) * rows], w, b, K))
        np.testing.assert_array_equal(out[k * rows:(k + 1) * rows], ref)


def test_fused_train_step_sharded_matches_single(interpreted, mesh8):
    """The FULL fused train step (fused LSTM sequence + hybrid CE; the
    plain threefry z path, which is sharding-invariant) on the 8-device
    mesh reproduces the single-device fused step (VERDICT r3 #2)."""
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.models.cvae import CVAEModel
    from vae_captioning_tpu.parallel import mesh as mesh_lib
    from vae_captioning_tpu.train import (TrainState, init_model,
                                          make_optimizer, make_train_step)

    cfg = Config(prior="AG", use_c_v=True, embed_size=128,
                 encoder_hidden=128, decoder_hidden=128, latent_size=16,
                 gen_z_samples=4, batch_size=16)
    cfg.vocab_size = 256
    cfg.fused_force = True      # bypass the TPU gate (interpret mode)
    cfg.fused_lstm_seq = True
    cfg.ce_hybrid = True
    cfg.fused_z = False         # threefry z: bit-identical under sharding

    model = CVAEModel.from_config(cfg)
    assert model.use_fused_seq and not model.use_fused_z
    _, params = init_model(cfg, jax.random.PRNGKey(0), model=model)
    tx = make_optimizer(cfg)

    rng = np.random.default_rng(3)
    B, T = 16, 8
    feats = jnp.asarray(rng.normal(size=(B, 4096)).astype(np.float32))
    enc = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
    dec = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.asarray(rng.integers(2, T, size=B), jnp.int32)
    c_v = rng.random((B, cfg.num_clusters)).astype(np.float32)
    c_v = jnp.asarray(c_v / c_v.sum(-1, keepdims=True))
    key = jax.random.PRNGKey(7)

    # single device (no mesh registered)
    ks.set_dp_mesh(None)
    step0 = make_train_step(model, tx, cfg, donate=False)
    st0 = TrainState.create(params, tx)
    st0, m0 = step0(st0, feats, enc, dec, lengths, c_v, key)
    m0 = jax.tree.map(float, m0)

    # 8-device dp mesh, sharded inputs, replicated params
    with ks.dp_mesh(mesh8):
        step1 = make_train_step(model, tx, cfg, donate=False)
        st1 = TrainState.create(mesh_lib.replicate(params, mesh8), tx)
        args = mesh_lib.shard_batch((feats, enc, dec, lengths, c_v), mesh8)
        st1, m1 = step1(st1, *args, key)
        m1 = jax.tree.map(float, m1)

    assert np.isfinite(m1["loss"])
    np.testing.assert_allclose(m1["loss"], m0["loss"], rtol=1e-4)
    np.testing.assert_allclose(m1["grad_norm"], m0["grad_norm"], rtol=1e-3)
    # updated params agree too (optimizer ran on psummed grads).  Adam's
    # first-step update is ~ lr·sign(g): for elements with g ≈ 0 the f32
    # psum reassociation can flip the sign and move the update by ~2·lr,
    # so bound the mismatch FRACTION instead of every element
    flat0 = jax.tree.leaves(st0.params)
    flat1 = jax.tree.leaves(st1.params)
    total = bad = 0
    for a, e in zip(flat1, flat0):
        a = np.asarray(a, np.float32)
        e = np.asarray(e, np.float32)
        scale = np.abs(e).max() + 1e-6
        diff = np.abs(a - e) / scale
        bad += int((diff > 5e-4).sum())
        total += diff.size
    assert bad / total < 1e-4, f"{bad}/{total} param elements off"


# ----------------------------------------------------------------------
# decode-path kernels (round 4: serving-side GSPMD, same hole as train)
# ----------------------------------------------------------------------

def test_lstm_step_sharded_matches_single(interpreted, mesh8):
    from vae_captioning_tpu.ops import fused_lstm_step as flstep
    rng = np.random.default_rng(4)
    M, H, E, V = 16, 128, 128, 64
    tokens = jnp.asarray(rng.integers(0, V, M), jnp.int32)
    c = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.3, size=(E + H, 4 * H)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, size=(4 * H,)).astype(np.float32))

    nc0, nh0 = flstep.fused_lstm_step(tokens, c, h, emb, w, b)
    with ks.dp_mesh(mesh8):
        nc1, nh1 = ks.lstm_step(tokens, c, h, emb, w, b)
    np.testing.assert_array_equal(np.asarray(nc0), np.asarray(nc1))
    np.testing.assert_array_equal(np.asarray(nh0), np.asarray(nh1))


def _logits_inputs(M=16, H=128, V=300, seed=5):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, size=(H, V)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, size=(V,)).astype(np.float32))
    return h, w, b


def test_logits_top_k_sharded_matches_single(interpreted, mesh8):
    from vae_captioning_tpu.ops import fused_logits_topk as flt
    h, w, b = _logits_inputs()
    for k in (1, 3, 10):
        v0, i0, l0 = flt.fused_logits_top_k(h, w, b, k)
        with ks.dp_mesh(mesh8):
            v1, i1, l1 = ks.logits_top_k(h, w, b, k)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_logits_top_k_int8_sharded_matches_single(interpreted, mesh8):
    from vae_captioning_tpu.ops import fused_logits_topk as flt
    h, w, b = _logits_inputs(seed=6)
    wq, ws = flt.quantize_logits_weights(w)
    v0, i0, l0 = flt.fused_logits_top_k_int8(h, wq, ws, b, 3)
    with ks.dp_mesh(mesh8):
        v1, i1, l1 = ks.logits_top_k_int8(h, wq, ws, b, 3)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_topk_lse_sharded_matches_single(interpreted, mesh8):
    from vae_captioning_tpu.ops import topk_pallas as tkp
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16, 300)).astype(np.float32))
    v0, i0, l0 = tkp.top_k_logsumexp_pallas(x, 3)
    with ks.dp_mesh(mesh8):
        v1, i1, l1 = ks.topk_lse(x, 3)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_logits_sample_shard_seeds_distinct(mesh8, monkeypatch):
    """Each shard must fold its axis_index into the sampling seed —
    without it, lanes on different shards would reuse the same
    per-local-row Gumbel noise streams."""
    from vae_captioning_tpu.ops import fused_logits_topk as flt

    def fake(h, w, b, seed, temperature=1.0):
        return jnp.full((h.shape[0],), seed & 0x7FFF, jnp.int32)

    monkeypatch.setattr(flt, "fused_logits_sample", fake)
    h, w, b = _logits_inputs(M=16)
    with ks.dp_mesh(mesh8):
        out = np.asarray(ks.logits_sample(h, w, b, jnp.int32(3), 1.0))
    per_shard = out[::2]
    assert len(set(per_shard.tolist())) == 8, per_shard

    def mix32(i):
        v = ((i + 1) * -1640531527) & 0xFFFFFFFF
        return v - 0x100000000 if v >= 0x80000000 else v

    expected = [(3 ^ mix32(i)) & 0x7FFF for i in range(8)]
    np.testing.assert_array_equal(per_shard, np.asarray(expected, np.int32))


def test_fused_beam_decode_sharded_matches_single(interpreted, mesh8):
    """End-to-end FUSED beam decode (fused LSTM step + fused logits
    top-K inside the beam while_loop) on the 8-device mesh equals the
    single-device fused decode — the serving-side analogue of
    test_fused_train_step_sharded_matches_single."""
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.data.vocabulary import Vocabulary
    from vae_captioning_tpu.inference import make_decode_fns
    from vae_captioning_tpu.models.cvae import CVAEModel
    from vae_captioning_tpu.parallel import mesh as mesh_lib
    from vae_captioning_tpu.train import init_model

    cfg = Config(embed_size=128, latent_size=16, encoder_hidden=128,
                 decoder_hidden=128, gen_z_samples=4, prior="AG",
                 use_c_v=True, gen_max_len=5, beam_size=3,
                 compute_dtype="bfloat16")
    cfg.vocab_size = 64
    cfg.fused_force = True          # interpret-mode decode kernels
    vocab = Vocabulary(["<BOS>", "<EOS>", "<UNK>"]
                       + [f"w{i}" for i in range(60)])
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    fns = make_decode_fns(CVAEModel.from_config(cfg), cfg, vocab)

    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.normal(size=(16, 4096)).astype(np.float32))
    c_v = rng.random((16, 90)).astype(np.float32)
    c_v = jnp.asarray(c_v / c_v.sum(-1, keepdims=True))
    key = jax.random.PRNGKey(5)

    ks.set_dp_mesh(None)
    t0, s0 = fns["beam_search"](params, feats, c_v, key)
    t0, s0 = np.asarray(t0), np.asarray(s0)

    with ks.dp_mesh(mesh8):
        fns_s = make_decode_fns(CVAEModel.from_config(cfg), cfg, vocab)
        feats_s, cv_s = mesh_lib.shard_batch(
            (np.asarray(feats), np.asarray(c_v)), mesh8)
        params_r = mesh_lib.replicate(params, mesh8)
        t1, s1 = fns_s["beam_search"](params_r, feats_s, cv_s, key)
    np.testing.assert_array_equal(t0, np.asarray(t1))
    np.testing.assert_allclose(s0, np.asarray(s1), rtol=1e-5)
