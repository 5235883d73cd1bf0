"""Device-honest component benchmarks: marginal time per iteration.

The axon relay adds a large FIXED cost to every jitted call (~30-55 ms
dispatch + fetch, measured), so per-call timing overstates device time
badly at these scales.  This harness times each component at two
iteration counts folded inside ONE jit (``lax.scan``) and reports the
MARGINAL time per iteration — the slope, which the fixed cost cancels
out of.  This is the methodology behind PERF.md's round-2 decode-step
table; on real production hardware (no relay) the marginal number is
the one that matters.

Components:
  * ``decode_step``  — fused LSTM step + fused logits top-K (the beam
                       inner loop) at M = batch·beam lanes
  * ``beam_body``    — the full beam_search body incl. bookkeeping
  * ``train_step``   — one dp train step (fwd+bwd+optax) per iteration
  * ``vgg16``        — VGG16 fc2 feature extraction (SURVEY hot-loop #0;
                       the reference ran ONE image per sess.run)

Run ON TPU:  python benchmarks/bench_device.py [--components ...]
Prints one JSON line per component.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from timing_util import marginal_ms  # noqa: E402 (after sys.path insert)
from vae_captioning_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()


def _emit(component, ms_per_iter, unit_count, unit):
    print(json.dumps({
        "component": component,
        "marginal_ms_per_iter": round(ms_per_iter, 4),
        "device_throughput": round(unit_count / (ms_per_iter / 1000), 1),
        "unit": unit,
    }))


def bench_decode_step(batch=2048, beam=3):
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.models.cvae import (decoder_step_params,
                                                logits_head_params)
    from vae_captioning_tpu.ops.fused_lstm_step import fused_lstm_step
    from vae_captioning_tpu.ops.fused_logits_topk import fused_logits_top_k
    from vae_captioning_tpu.train import init_model

    cfg = Config(prior="AG", use_c_v=True)
    cfg.vocab_size = 11500
    _, params = init_model(cfg, jax.random.PRNGKey(0))
    emb, kern, kbias = decoder_step_params(params)
    w, b = logits_head_params(params)
    M = batch * beam
    rng = np.random.default_rng(0)
    c0 = jnp.asarray(rng.normal(size=(M, cfg.decoder_hidden))
                     .astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(M, cfg.decoder_hidden))
                     .astype(np.float32))
    t0 = jnp.asarray(rng.integers(0, cfg.vocab_size, M).astype(np.int32))

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(c, h, toks, steps):
        def body(carry, _):
            c, h, toks = carry
            nc, nh = fused_lstm_step(toks, c, h, emb, kern, kbias)
            vals, idx, lse = fused_logits_top_k(nh, w, b, beam)
            return (nc, nh, idx[:, 0]), None
        (c, h, toks), _ = jax.lax.scan(body, (c, h, toks), None,
                                       length=steps)
        return toks[:8]

    ms, _ = marginal_ms(lambda n: run(c0, h0, t0, n))
    _emit("decode_step", ms, M, f"lanes/sec at M={M}")


def bench_beam_body(batch=2048, beam=3, max_len=30):
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.data.vocabulary import Vocabulary
    from vae_captioning_tpu.inference import make_decode_fns
    from vae_captioning_tpu.models.cvae import CVAEModel
    from vae_captioning_tpu.train import init_model

    cfg = Config(prior="AG", use_c_v=True, beam_size=beam,
                 gen_max_len=max_len)
    cfg.vocab_size = 11500
    vocab = Vocabulary(["<BOS>", "<EOS>", "<UNK>"]
                       + [f"w{i}" for i in range(cfg.vocab_size - 4)])
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    features = jnp.asarray(
        rng.normal(size=(batch, cfg.cnn_feature_size)).astype(np.float32))
    c_v = rng.random((batch, cfg.num_clusters)).astype(np.float32)
    c_v = jnp.asarray(c_v / c_v.sum(-1, keepdims=True))

    fns = {}
    for L in (max_len, max_len * 4):
        c = Config(prior="AG", use_c_v=True, beam_size=beam, gen_max_len=L)
        c.vocab_size = cfg.vocab_size
        # early_exit would cut the long run short on random weights only
        # rarely; keep it (production config) — random logits don't EOS
        fns[L] = make_decode_fns(CVAEModel.from_config(c), c, vocab)[
            "beam_search"]

    key = jax.random.PRNGKey(0)

    def run(L):
        t, _ = fns[L](params, features, c_v, key)
        return t

    ms, _ = marginal_ms(run, n_lo=max_len, n_hi=max_len * 4, reps=5)
    _emit("beam_body", ms, batch * beam, f"lanes/sec at B={batch} K={beam}")


def bench_train_step(batch=256, k=5, t_len=24, optax_flatten=False,
                     label="train_step", ce_xla_bwd=False,
                     fused_heads=True, ce_bias_fold=False):
    # fused_heads=True is the shipped Config default (round-5 A/B
    # winner), so the plain "train_step" label measures the default path
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.train import (TrainState, init_model,
                                          make_optimizer, make_train_step)

    cfg = Config(prior="AG", use_c_v=True, optax_flatten=optax_flatten,
                 ce_xla_bwd=ce_xla_bwd, fused_heads=fused_heads,
                 ce_bias_fold=ce_bias_fold)
    cfg.vocab_size = 11500
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(batch, cfg.cnn_feature_size))
                        .astype(np.float32))
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size,
                                      size=(batch * k, t_len))
                         .astype(np.int32))
    dec_in = jnp.asarray(rng.integers(1, cfg.vocab_size,
                                      size=(batch * k, t_len))
                         .astype(np.int32))
    lens = jnp.asarray(np.full(batch * k, t_len - 2, np.int32))
    cv = rng.random((batch, cfg.num_clusters)).astype(np.float32)
    cv = jnp.asarray(cv / cv.sum(-1, keepdims=True))
    key = jax.random.PRNGKey(1)

    # marginal over repeated calls (same state input; dispatch pipelines
    # on device) — N sequential dispatches, one fetch
    def run(n):
        out = None
        for i in range(n):
            s2, m = step(state, feats, labels, dec_in, lens, cv,
                         jax.random.fold_in(key, i))
            out = m["loss"]
        return out

    ms, _ = marginal_ms(run, n_lo=4, n_hi=16, reps=5)
    _emit(label, ms, batch,
          f"images/sec at B={batch} K={k} flatten={optax_flatten}")


def bench_train_step_flatten_ab(batch=256, k=5, t_len=24):
    """A/B of Config.optax_flatten (one raveled-vector optimizer update
    vs ~40 per-leaf kernels) on the production train step."""
    bench_train_step(batch, k, t_len, optax_flatten=False,
                     label="train_step_leafwise")
    bench_train_step(batch, k, t_len, optax_flatten=True,
                     label="train_step_flatten")


def bench_train_step_ce_ab(batch=256, k=5, t_len=24):
    """A/B of Config.ce_xla_bwd (XLA CE forward + Pallas dW+db/dh
    backward — one fewer full pass over the [M, V] logits) against the
    default all-XLA CE, same process."""
    bench_train_step(batch, k, t_len, ce_xla_bwd=False,
                     label="train_step_ce_xla")
    bench_train_step(batch, k, t_len, ce_xla_bwd=True,
                     label="train_step_ce_xla_bwd")


def bench_train_step_heads_ab(batch=256, k=5, t_len=24):
    """A/B of Config.fused_heads (fused AG heads+combine Pallas kernels,
    ops/fused_ag_heads.py) against the XLA heads path, same process."""
    bench_train_step(batch, k, t_len, fused_heads=False,
                     label="train_step_heads_xla")
    bench_train_step(batch, k, t_len, fused_heads=True,
                     label="train_step_heads_fused")


def bench_train_step_biasfold_ab(batch=256, k=5, t_len=24):
    """A/B of Config.ce_bias_fold (logits = [h ‖ 1] @ [[W],[b]]: db
    falls out of XLA's dW fusion, no standalone [N, V] column-sum pass)
    against the Dense logits head, same process."""
    bench_train_step(batch, k, t_len, ce_bias_fold=False,
                     label="train_step_bias_dense")
    bench_train_step(batch, k, t_len, ce_bias_fold=True,
                     label="train_step_bias_fold")


def bench_vgg16(batch=64):
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.models.vgg16 import VGG16

    cfg = Config()
    model = VGG16(trainable_top=False, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, size=(batch, 224, 224, 3))
                       .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)

    fwd = jax.jit(lambda p, x: model.apply(p, x)[0, 0])

    # sequential dispatches, one fetch — a scanned variant would need
    # two more full VGG compiles (~4 min each on the remote compile
    # service); N pipelined dispatches amortize the relay the same way
    def run(n):
        out = None
        for _ in range(n):
            out = fwd(params, imgs)
        return out

    ms, _ = marginal_ms(run, n_lo=2, n_hi=8)
    _emit("vgg16_extract", ms, batch, f"images/sec at B={batch}")


def bench_finetune_step(batch=32, k=5, t_len=24):
    """Raw 224² images → VGG16 → CVAE, fwd+bwd+two-group optimizer — the
    reference's fine-tune regime at its default batch 32."""
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.train import (TrainState, init_model,
                                          make_finetune_optimizer,
                                          make_train_step)

    cfg = Config(prior="AG", use_c_v=True, fine_tune=True,
                 fine_tune_fe=True, fine_tune_top=True)
    cfg.vocab_size = 11500
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    tx = make_finetune_optimizer(cfg)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, size=(batch, 224, 224, 3))
                       .astype(np.float32))
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size,
                                      size=(batch * k, t_len))
                         .astype(np.int32))
    dec_in = jnp.asarray(rng.integers(1, cfg.vocab_size,
                                      size=(batch * k, t_len))
                         .astype(np.int32))
    lens = jnp.asarray(np.full(batch * k, t_len - 2, np.int32))
    cv = rng.random((batch, cfg.num_clusters)).astype(np.float32)
    cv = jnp.asarray(cv / cv.sum(-1, keepdims=True))
    key = jax.random.PRNGKey(1)

    def run(n):
        out = None
        for i in range(n):
            s2, m = step(state, imgs, labels, dec_in, lens, cv,
                         jax.random.fold_in(key, i))
            out = m["loss"]
        return out

    ms, _ = marginal_ms(run, n_lo=2, n_hi=8)
    _emit("finetune_step", ms, batch, f"images/sec at B={batch} K={k}")


ALL = {"decode_step": bench_decode_step, "beam_body": bench_beam_body,
       "train_step": bench_train_step,
       "train_flatten_ab": bench_train_step_flatten_ab,
       "train_ce_ab": bench_train_step_ce_ab,
       "train_heads_ab": bench_train_step_heads_ab,
       "train_biasfold_ab": bench_train_step_biasfold_ab,
       "vgg16": bench_vgg16, "finetune_step": bench_finetune_step}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--components", nargs="*", default=list(ALL))
    p.add_argument("--batch", type=int, default=None,
                   help="override batch for decode_step / beam_body")
    p.add_argument("--beam", type=int, default=None,
                   help="override beam for decode_step / beam_body")
    args = p.parse_args(argv)
    overrides = {k: v for k, v in
                 (("batch", args.batch), ("beam", args.beam))
                 if v is not None}
    for name in args.components:
        if name in ("decode_step", "beam_body") and overrides:
            ALL[name](**overrides)
        else:
            ALL[name]()


if __name__ == "__main__":
    main()
