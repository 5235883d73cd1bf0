"""Small-batch serving latency: batch 1-8 decode, median / p90 per call.

VERDICT r2 #9: the round-2 serving table (65.9 ms median beam-3 at
batch 1) predates the small-batch row-block change in
ops/fused_logits_topk.py (`_row_block`: requests under 256 rows no
longer pad the extraction sweeps to 256).  This harness measures:

  * per-call wall latency through the axon relay (what a tunneled
    client sees — includes the ~30-55 ms fixed dispatch+fetch cost), and
  * the marginal per-decode-step device time (what production serving
    off the relay pays), via the shared two-length slope method.

Run ON TPU:  python benchmarks/bench_serving.py [--batches 1 2 8]
One JSON line per (batch, mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

from timing_util import marginal_ms  # noqa: E402
from vae_captioning_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()


def bench(batch: int, mode: str, vocab_size: int = 11500,
          reps: int = 15):
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.data.vocabulary import Vocabulary
    from vae_captioning_tpu.inference import make_decode_fns
    from vae_captioning_tpu.models.cvae import CVAEModel
    from vae_captioning_tpu.train import init_model

    lens = {}
    fns = {}
    vocab = Vocabulary(["<BOS>", "<EOS>", "<UNK>"]
                       + [f"w{i}" for i in range(vocab_size - 4)])
    for L in (30, 120):
        cfg = Config(prior="AG", use_c_v=True, beam_size=3, gen_max_len=L)
        cfg.vocab_size = vocab_size
        lens[L] = cfg
        fns[L] = make_decode_fns(CVAEModel.from_config(cfg), cfg, vocab)[mode]
    model, params = init_model(lens[30], jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(batch, 4096)).astype(np.float32))
    c_v = rng.random((batch, 90)).astype(np.float32)
    c_v = jnp.asarray(c_v / c_v.sum(-1, keepdims=True))
    key = jax.random.PRNGKey(0)

    def call(L):
        res = fns[L](params, feats, c_v, key)
        return res[0] if isinstance(res, tuple) else res

    # marginal per-step device time (30- vs 120-step graphs)
    step_ms, _ = marginal_ms(call, n_lo=30, n_hi=120, reps=5)

    # per-call wall latency at the production length (30)
    np.asarray(call(30))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(call(30))
        times.append((time.perf_counter() - t0) * 1000)
    times.sort()
    print(json.dumps({
        "batch": batch, "mode": mode,
        "median_ms": round(times[len(times) // 2], 2),
        "p90_ms": round(times[int(len(times) * 0.9)], 2),
        "marginal_ms_per_step": round(step_ms, 4),
        "device_30step_ms": round(step_ms * 30, 2),
    }), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="*", type=int, default=[1, 8])
    p.add_argument("--modes", nargs="*", default=["greedy", "beam_search"])
    args = p.parse_args(argv)
    for b in args.batches:
        for m in args.modes:
            bench(b, m)


if __name__ == "__main__":
    main()
