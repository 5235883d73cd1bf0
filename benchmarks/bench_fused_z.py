"""fused_z TPU validation + A/B (the PRNG stream has no interpreter
lowering, so everything stream-related is validated here, on hardware):

  1. eps moments — the on-chip inverse-CDF draws must be N(0, 1)
  2. stream parity — fused forward == explicit-eps reference fed the
     kernel's own eps (same bf16/f32 math)
  3. train-step marginal A/B — Config.fused_z on vs off at reference
     shapes, plus loss/grad-norm finiteness on the fused stream

Run ON TPU:  python benchmarks/bench_fused_z.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from timing_util import marginal_ms  # noqa: E402
from vae_captioning_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()


def check_stream() -> None:
    from vae_captioning_tpu.ops import fused_z as fz

    B, L, K, E = 256, 150, 100, 256
    rng = np.random.default_rng(0)
    mean = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    std = jnp.asarray(rng.uniform(0.3, 1.5, size=(B, L)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, size=(K * L, E)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
    sd = jnp.asarray([5, 9], jnp.int32)

    eps = np.asarray(fz.sample_project_debug_eps(sd, B, L, K))
    print(json.dumps({
        "check": "eps_moments", "n": int(eps.size),
        "mean": round(float(eps.mean()), 5),
        "std": round(float(eps.std()), 5),
        "skew": round(float(((eps - eps.mean()) ** 3).mean()
                            / eps.std() ** 3), 5),
        "p_gt2sigma": round(float((np.abs(eps) > 2).mean()), 5),
        "expect": "0 / 1 / 0 / 0.0455",
    }))

    out = np.asarray(fz.fused_sample_project(sd, mean, std, w, b, K),
                     np.float32)
    ref = np.asarray(fz.sample_project_xla(sd, mean, std, w, b, K,
                                           jnp.asarray(eps)), np.float32)
    print(json.dumps({
        "check": "stream_parity",
        "max_abs_diff": float(np.abs(out - ref).max()),
        "rel": float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)),
    }))


def train_ab() -> None:
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.train import (TrainState, init_model,
                                          make_optimizer, make_train_step)

    batch, k, t_len = 256, 5, 24
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(batch, 4096)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 11500, size=(batch * k, t_len))
                         .astype(np.int32))
    dec_in = jnp.asarray(rng.integers(1, 11500, size=(batch * k, t_len))
                         .astype(np.int32))
    lens = jnp.asarray(np.full(batch * k, t_len - 2, np.int32))
    cv = rng.random((batch, 90)).astype(np.float32)
    cv = jnp.asarray(cv / cv.sum(-1, keepdims=True))
    key = jax.random.PRNGKey(1)

    for name, fz_on in (("fused_z", True), ("xla_z", False)):
        cfg = Config(prior="AG", use_c_v=True)
        cfg.vocab_size = 11500
        cfg.fused_z = fz_on
        model, params = init_model(cfg, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, cfg, donate=False)
        s = state
        for i in range(3):
            s, m = step(s, feats, labels, dec_in, lens, cv,
                        jax.random.fold_in(key, i))
        loss3, gn3 = float(m["loss"]), float(m["grad_norm"])

        def run(n, step=step, state=state):
            out = None
            for i in range(n):
                _, mm = step(state, feats, labels, dec_in, lens, cv,
                             jax.random.fold_in(key, i))
                out = mm["loss"]
            return out

        ms, _ = marginal_ms(run, n_lo=4, n_hi=16, reps=5)
        print(json.dumps({"impl": name, "train_step_ms": round(ms, 2),
                          "img_per_s": round(batch / ms * 1e3),
                          "loss3": loss3, "gnorm3": gn3}))


if __name__ == "__main__":
    check_stream()
    train_ab()
