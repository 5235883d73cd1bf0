"""Benchmark: COCO-style caption generation throughput, beam=3, per chip.

Headline metric from BASELINE.md: the driver north-star is >5k images/sec
on a v5e-8 at beam 3 → 625 captions/sec/chip.  ``vs_baseline`` is
measured-value / 625.

Runs the flagship AG-CVAE (reference default dims: embed 256, LSTM 512,
latent 150, 100 z samples, vocab ~11.5k) end-to-end on device: features →
cluster-conditioned z draw → init state → batched beam search, one jit,
no host round-trips inside the timed region.

Prints ONE JSON line.

``--trained N`` (VERDICT r1 #8) first fits N synthetic steps on a
structured task (features anchored per caption template) so the decode
runs on PEAKED distributions — the regime where the beam-search
early-exit bound actually fires; random weights cannot regress that
path.  The metric line then reports
``captions_per_sec_per_chip_beam3_trained``.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent executable cache.  NOTE: measured ineffective through the
# axon remote-compile service (a warm-cache fresh process still spends
# ~7 min in the first beam_fn call: 50 s init, 26 s data upload, ~6 min
# warmup-0/compile at batch 4096) — kept because it is free and becomes
# useful on a standard TPU runtime where the cache does serialize.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_bench_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

BASELINE_PER_CHIP = 625.0  # 5000 img/s on 8 chips
BEAM = 3
BATCH = 4096  # batch-size sweep in PERF.md; 4096 best per-chip throughput
              # (2048 -> 27.5k, 4096 -> 35.9k caps/s with the round-2 stack)
GEN_MAX_LEN = 30
VOCAB = 11500


def _train_synthetic(cfg, model, params, vocab, steps: int,
                     train_batch: int = 128):
    """Overfit a 64-template synthetic captioning task: each template is
    a fixed token sequence with a fixed feature anchor (+noise), so the
    decoder's per-step distributions peak and sequences EOS early."""
    from vae_captioning_tpu.train import (TrainState, make_optimizer,
                                          make_train_step)

    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, cfg, donate=False)

    rng = np.random.default_rng(1)
    n_templates, T = 64, 16
    words = rng.integers(3, vocab.vocab_size,
                         size=(n_templates, T - 1)).astype(np.int32)
    lens = rng.integers(5, T - 1, size=n_templates).astype(np.int32)
    anchors = rng.normal(size=(n_templates, cfg.cnn_feature_size)) \
        .astype(np.float32)
    cvs = rng.random((n_templates, cfg.num_clusters)).astype(np.float32)
    cvs /= cvs.sum(-1, keepdims=True)
    bos, eos = vocab.bos_id, vocab.eos_id

    dec_rows = np.zeros((n_templates, T), np.int32)   # [BOS, w...]
    lab_rows = np.zeros((n_templates, T), np.int32)   # [w..., EOS]
    for t in range(n_templates):
        L = int(lens[t])
        dec_rows[t, 0] = bos
        dec_rows[t, 1:L + 1] = words[t, :L]
        lab_rows[t, :L] = words[t, :L]
        lab_rows[t, L] = eos
    row_len = (lens + 1).astype(np.int32)

    key = jax.random.PRNGKey(7)
    for s in range(steps):
        ids = rng.integers(0, n_templates, train_batch)
        feats = anchors[ids] + 0.05 * rng.normal(
            size=(train_batch, cfg.cnn_feature_size)).astype(np.float32)
        state, _ = step(state, jnp.asarray(feats),
                        jnp.asarray(lab_rows[ids]),
                        jnp.asarray(dec_rows[ids]),
                        jnp.asarray(row_len[ids]), jnp.asarray(cvs[ids]),
                        jax.random.fold_in(key, s))
    jax.block_until_ready(state.params)
    return state.params, anchors, cvs


def main(argv=None) -> None:
    import argparse

    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.inference import make_decode_fns
    from vae_captioning_tpu.models.cvae import CVAEModel
    from vae_captioning_tpu.data.vocabulary import Vocabulary
    from vae_captioning_tpu.train import init_model

    p = argparse.ArgumentParser()
    p.add_argument("--trained", type=int, default=0, metavar="STEPS",
                   help="train STEPS synthetic steps first; time decode "
                        "on the peaked (early-exit-active) model")
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--vocab", type=int, default=VOCAB)
    args = p.parse_args(argv)
    batch, vocab_size = args.batch, args.vocab

    cfg = Config(prior="AG", use_c_v=True, beam_size=BEAM,
                 gen_max_len=GEN_MAX_LEN, sample_gen="beam_search")
    cfg.vocab_size = vocab_size
    # a synthetic vocab of the right size (ids drive shapes only)
    vocab = Vocabulary(["<BOS>", "<EOS>", "<UNK>"]
                       + [f"w{i}" for i in range(vocab_size - 4)])
    assert vocab.vocab_size == vocab_size

    model, params = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    if args.trained:
        params, anchors, cvs = _train_synthetic(cfg, model, params, vocab,
                                                args.trained)
        # decode on in-distribution features: the trained model peaks and
        # EOSes early — exactly the early-exit path this variant covers
        ids = rng.integers(0, anchors.shape[0], batch)
        features = anchors[ids] + 0.05 * rng.normal(
            size=(batch, cfg.cnn_feature_size)).astype(np.float32)
        features = jnp.asarray(features)
        c_v = jnp.asarray(cvs[ids])
    else:
        features = jnp.asarray(rng.normal(size=(batch, cfg.cnn_feature_size))
                               .astype(np.float32))
        c_v = rng.random((batch, cfg.num_clusters)).astype(np.float32)
        c_v = jnp.asarray(c_v / c_v.sum(-1, keepdims=True))
    fns = make_decode_fns(CVAEModel.from_config(cfg), cfg, vocab)
    beam_fn = fns["beam_search"]

    key = jax.random.PRNGKey(0)
    # warmup / compile.  NOTE: on the axon relay, block_until_ready alone
    # does not force remote execution — a host transfer does, so timing
    # fetches the token array each iteration (61 KB, negligible).
    for i in range(2):
        tokens, scores = beam_fn(params, features, c_v,
                                 jax.random.fold_in(key, 100 + i))
        np.asarray(tokens)

    # median per-iteration time: robust to transient relay/queue
    # contention (observed run-to-run swings on the shared tunnel)
    times = []
    for i in range(9):
        t0 = time.perf_counter()
        tokens, scores = beam_fn(params, features, c_v,
                                 jax.random.fold_in(key, i))
        np.asarray(tokens)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    n_chips = len(jax.devices())
    per_chip = batch / dt / n_chips
    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam3"
                  + ("_trained" if args.trained else ""),
        "value": round(per_chip, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
