"""Multi-chip (8 virtual CPU devices) tests: sharded decode parity,
mesh helpers, and the driver's dryrun_multichip entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_captioning_tpu.parallel import mesh as mesh_lib


def test_mesh_helpers():
    mesh = mesh_lib.create_mesh()
    assert mesh.devices.size == 8
    x = np.arange(16, dtype=np.float32).reshape(16, 1)
    sharded = mesh_lib.shard_batch(x, mesh)
    assert len(sharded.sharding.device_set) == 8
    rep = mesh_lib.replicate(x, mesh)
    assert len(rep.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_pad_to_multiple():
    x = np.ones((5, 3), np.float32)
    out = mesh_lib.pad_to_multiple(x, 8)
    assert out.shape == (8, 3)
    assert (out[5:] == 0).all()
    same = mesh_lib.pad_to_multiple(np.ones((8, 3), np.float32), 8)
    assert same.shape == (8, 3)


def test_sharded_beam_decode_matches_unsharded():
    """Decode with the batch sharded over the dp mesh must equal the
    single-device result (decode is embarrassingly parallel, SURVEY §5)."""
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.data.vocabulary import Vocabulary
    from vae_captioning_tpu.inference import make_decode_fns
    from vae_captioning_tpu.models.cvae import CVAEModel
    from vae_captioning_tpu.train import init_model

    cfg = Config(embed_size=16, latent_size=8, encoder_hidden=16,
                 decoder_hidden=16, gen_z_samples=4, prior="AG",
                 use_c_v=True, gen_max_len=6, beam_size=3)
    cfg.vocab_size = 40
    vocab = Vocabulary(["<BOS>", "<EOS>", "<UNK>"]
                       + [f"w{i}" for i in range(36)])
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    fns = make_decode_fns(CVAEModel.from_config(cfg), cfg, vocab)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(16, 4096)).astype(np.float32))
    c_v = rng.random((16, 90)).astype(np.float32)
    c_v = jnp.asarray(c_v / c_v.sum(-1, keepdims=True))
    key = jax.random.PRNGKey(5)

    t1, s1 = fns["beam_search"](params, feats, c_v, key)

    mesh = mesh_lib.create_mesh()
    feats_s, cv_s = mesh_lib.shard_batch((np.asarray(feats),
                                          np.asarray(c_v)), mesh)
    params_r = mesh_lib.replicate(params, mesh)
    t2, s2 = fns["beam_search"](params_r, feats_s, cv_s, key)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_dryrun_multichip_entry():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # must not raise


def test_entry_forward_jits():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
