"""Capture a jax.profiler trace of the production train step and print
the per-op cost aggregation (utils/xplane reader).

Usage:  python benchmarks/profile_train_step.py [trace_dir]

Same config as benchmarks/bench_device.py::bench_train_step (AG prior,
vocab 11500, B=256 K=5 T=24) so the numbers line up with the A/B
harness and PERF.md's train-step rows.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from vae_captioning_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main(trace_dir="/tmp/train_step_trace", batch=256, k=5, t_len=24):
    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.train import (TrainState, init_model,
                                          make_optimizer, make_train_step)
    from vae_captioning_tpu.utils import xplane

    cfg = Config(prior="AG", use_c_v=True)
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

    # warmup (compile + one run)
    s2, m = step(state, feats, labels, dec_in, lens, cv, key)
    float(m["loss"])

    with jax.profiler.trace(trace_dir):
        out = None
        for i in range(20):
            s2, m = step(state, feats, labels, dec_in, lens, cv,
                         jax.random.fold_in(key, i))
            out = m["loss"]
        float(out)

    path = xplane.resolve_trace_path(trace_dir)
    planes = xplane.aggregate(path)   # {plane_name: [OpStats], ...}
    print(f"\n== per-op cost over 20 steps ({path}) ==")
    for pname, ops in planes.items():
        if "TPU" not in pname and "device" not in pname:
            continue
        total = sum(o.duration_ms for o in ops)
        print(f"\n-- plane {pname}: {len(ops)} distinct ops, "
              f"Σ {total:.2f} ms = {total / 20:.3f} ms/step "
              f"(async spans overlap) --")
        for o in ops[:45]:
            print(f"{o.duration_ms:9.3f} ms  x{o.count:<5d} {o.name[:110]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
