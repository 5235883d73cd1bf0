"""Benchmark: COCO-style caption generation throughput, beam=3, per chip.

Headline metric from BASELINE.md: the driver north-star is >5k images/sec
on a v5e-8 at beam 3 → 625 captions/sec/chip.  ``vs_baseline`` is
measured-value / 625.

Runs the flagship AG-CVAE (reference default dims: embed 256, LSTM 512,
latent 150, 100 z samples, vocab ~11.5k) end-to-end on device: features →
cluster-conditioned z draw → init state → batched beam search, one jit,
no host round-trips inside the timed region.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PER_CHIP = 625.0  # 5000 img/s on 8 chips
BEAM = 3
BATCH = 2048  # batch-size sweep in PERF.md; 2048 best per-chip throughput
GEN_MAX_LEN = 30
VOCAB = 11500


def main() -> None:
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.inference import make_decode_fns
    from vae_captioning_tpu.models.cvae import CVAEModel
    from vae_captioning_tpu.data.vocabulary import Vocabulary
    from vae_captioning_tpu.train import init_model

    cfg = Config(prior="AG", use_c_v=True, beam_size=BEAM,
                 gen_max_len=GEN_MAX_LEN, sample_gen="beam_search")
    cfg.vocab_size = VOCAB
    # a synthetic vocab of the right size (ids drive shapes only)
    vocab = Vocabulary(["<BOS>", "<EOS>", "<UNK>"]
                       + [f"w{i}" for i in range(VOCAB - 4)])
    assert vocab.vocab_size == VOCAB

    model, params = init_model(cfg, jax.random.PRNGKey(0))
    fns = make_decode_fns(CVAEModel.from_config(cfg), cfg, vocab)
    beam_fn = fns["beam_search"]

    rng = np.random.default_rng(0)
    features = jnp.asarray(rng.normal(size=(BATCH, cfg.cnn_feature_size))
                           .astype(np.float32))
    c_v = rng.random((BATCH, cfg.num_clusters)).astype(np.float32)
    c_v = jnp.asarray(c_v / c_v.sum(-1, keepdims=True))

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
    per_chip = BATCH / dt / n_chips
    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam3",
        "value": round(per_chip, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
