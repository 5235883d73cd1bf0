"""Mosaic compile smoke for EVERY production Pallas kernel.

Motivation (VERDICT r4 #2, systemic lesson): interpret-mode parity is
not a compile proof — round 4's ``bitonic_merge`` was "bit-identical in
interpret mode" yet crashed the real Mosaic lowering (``rev`` has no TPU
lowering), and the crash was only discovered in a narrow relay window.
This script ``jit(...).lower(...).compile()``s each kernel — forward AND
custom-VJP backward where one exists — at small constraint-legal shapes
on the real TPU backend, so a kernel change that breaks the Mosaic
lowering fails HERE, not in a benchmark sweep or a training run.

Exit codes: 0 = all kernels compile, 1 = at least one failed,
75 (EX_TEMPFAIL) = no TPU backend reachable (relay down / CPU-only
environment) — callers should treat 75 as "skip", not "fail".

Usage:  python benchmarks/tpu_compile_smoke.py [--only NAME ...]
(relay-gated; run via ``tests/test_tpu_compile_smoke.py`` in the slow
tier, or standalone from ``benchmarks/run_tpu_pending.sh``-style
sessions.)
"""
import argparse
import os
import sys
import time

import numpy as np

# standalone-invocation robustness: `python benchmarks/tpu_compile_smoke.py`
# puts benchmarks/ (not the repo root) on sys.path[0]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _require_tpu():
    import jax
    try:
        backend = jax.default_backend()
        devs = jax.devices()
    except Exception as e:  # backend init failure == relay down
        print(f"no backend: {e}", flush=True)
        sys.exit(75)
    if backend not in ("tpu", "axon") and not any(
            d.platform == "tpu" for d in devs):
        print(f"default backend {backend!r} is not a TPU — skipping",
              flush=True)
        sys.exit(75)
    print(f"devices: {devs}", flush=True)


# ----------------------------------------------------------------------
# one entry per production kernel: name -> () -> jitted-compilable thunk.
# Shapes are the smallest that satisfy each kernel's alignment
# constraints (lane 128 / sublane 8); value correctness is the
# interpret-mode tests' job — this is purely "does Mosaic lower it".
# ----------------------------------------------------------------------

def _case_lstm_seq():
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.fused_lstm_seq import fused_lstm_seq
    T, B, E, H = 4, 8, 128, 128
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(T, B, E)).astype(np.float32))
    wx = jnp.asarray(r.normal(0, 0.05, (E, 4 * H)).astype(np.float32))
    wh = jnp.asarray(r.normal(0, 0.05, (H, 4 * H)).astype(np.float32))
    b = jnp.zeros((4 * H,), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    h0 = jnp.zeros((B, H), jnp.float32)
    mask = jnp.asarray(np.tril(np.ones((B, T)))[:, ::-1].copy() > 0)

    def loss(wx, wh, b):
        (c, h), hs = fused_lstm_seq(x, wx, wh, b, c0, h0, mask)
        return jnp.sum(c) + jnp.sum(h) + jnp.sum(hs.astype(jnp.float32))

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2))), (wx, wh, b)


def _case_z():
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.fused_z import fused_sample_project
    B, L, E, K_z = 8, 16, 128, 4
    r = np.random.default_rng(1)
    seed = jnp.asarray([3, 7], jnp.int32)
    mean = jnp.asarray(r.normal(size=(B, L)).astype(np.float32))
    std = jnp.asarray(r.random((B, L)).astype(np.float32) + 0.5)
    w = jnp.asarray(r.normal(0, 0.05, (K_z * L, E)).astype(np.float32))
    b = jnp.zeros((E,), jnp.float32)

    def loss(mean, std, w, b):
        out = fused_sample_project(seed, mean, std, w, b, K_z)
        return jnp.sum(out.astype(jnp.float32))

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))), (mean, std, w, b)


def _case_ag_heads():
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.fused_ag_heads import fused_ag_heads
    B, H, K, L = 8, 128, 7, 150
    r = np.random.default_rng(2)
    h = jnp.asarray(r.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.05, (H, 2 * K * L)).astype(np.float32))
    b = jnp.asarray(r.normal(0, 0.1, (2 * K * L,)).astype(np.float32))
    cv = r.random((B, K)).astype(np.float32)
    cv = jnp.asarray(cv / cv.sum(-1, keepdims=True))

    def loss(h, w, b, cv):
        m, s = fused_ag_heads(h, w, b, cv)
        return jnp.sum(m) + jnp.sum(s)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))), (h, w, b, cv)


def _ce_case(fn_name):
    def make():
        import jax
        import jax.numpy as jnp
        from vae_captioning_tpu.ops import fused_ce as fc
        fn = getattr(fc, fn_name)
        M, H, V = 64, 128, 384
        r = np.random.default_rng(3)
        h = jnp.asarray(r.normal(size=(M, H)).astype(np.float32))
        w = jnp.asarray(r.normal(0, 0.05, (H, V)).astype(np.float32))
        b = jnp.zeros((V,), jnp.float32)
        labels = jnp.asarray(r.integers(0, V, M).astype(np.int32))
        weights = jnp.ones((M,), jnp.float32)
        return (jax.jit(jax.grad(fn, argnums=(0, 1, 2))),
                (h, w, b, labels, weights))
    return make


def _case_lstm_step():
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.fused_lstm_step import fused_lstm_step
    M, H, E, V = 8, 128, 128, 384
    r = np.random.default_rng(4)
    tokens = jnp.asarray(r.integers(0, V, M).astype(np.int32))
    c = jnp.zeros((M, H), jnp.float32)
    h = jnp.zeros((M, H), jnp.float32)
    embed = jnp.asarray(r.normal(0, 0.05, (V, E)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.05, (E + H, 4 * H)).astype(np.float32))
    b = jnp.zeros((4 * H,), jnp.float32)
    return (jax.jit(fused_lstm_step), (tokens, c, h, embed, w, b))


def _case_logits_topk():
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.fused_logits_topk import fused_logits_top_k
    M, H, V, k = 128, 128, 512, 10
    r = np.random.default_rng(5)
    h = jnp.asarray(r.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.05, (H, V)).astype(np.float32))
    b = jnp.zeros((V,), jnp.float32)
    import functools
    return (jax.jit(functools.partial(fused_logits_top_k, k=k)), (h, w, b))


def _case_logits_topk_maxM():
    """PRODUCTION max-row shape: M = 32768·3 (the bench's largest batch
    at beam 3), full H=512 / vocab 11500.  The kernel's running-state
    scratch scales with TOTAL rows and tipped the old 17 MiB
    scoped-VMEM limit at M=24576 ('stack oom' at compile) — this case
    pins the 32 MiB headroom at the largest shape we actually run, so
    a future limit/scratch regression fails here, not in the bench."""
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.fused_logits_topk import fused_logits_top_k
    M, H, V, k = 32768 * 3, 512, 11500, 3
    r = np.random.default_rng(9)
    h = jnp.asarray(r.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.05, (H, V)).astype(np.float32))
    b = jnp.zeros((V,), jnp.float32)
    import functools
    return (jax.jit(functools.partial(fused_logits_top_k, k=k)), (h, w, b))


def _case_logits_topk_int8():
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.fused_logits_topk import (
        fused_logits_top_k_int8, quantize_logits_weights)
    M, H, V, k = 128, 128, 512, 10
    r = np.random.default_rng(6)
    h = jnp.asarray(r.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.05, (H, V)).astype(np.float32))
    b = jnp.zeros((V,), jnp.float32)
    wq, ws = quantize_logits_weights(w)
    import functools
    return (jax.jit(functools.partial(fused_logits_top_k_int8, k=k)),
            (h, wq, ws, b))


def _case_logits_sample():
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.fused_logits_topk import fused_logits_sample
    M, H, V = 128, 128, 512
    r = np.random.default_rng(7)
    h = jnp.asarray(r.normal(size=(M, H)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.05, (H, V)).astype(np.float32))
    b = jnp.zeros((V,), jnp.float32)
    seed = jnp.asarray(11, jnp.int32)
    return (jax.jit(fused_logits_sample), (h, w, b, seed))


def _case_topk_lse():
    import jax
    import jax.numpy as jnp
    from vae_captioning_tpu.ops.topk_pallas import top_k_logsumexp_pallas
    M, V, k = 128, 512, 10
    r = np.random.default_rng(8)
    x = jnp.asarray(r.normal(size=(M, V)).astype(np.float32))
    import functools
    return (jax.jit(functools.partial(top_k_logsumexp_pallas, k=k)), (x,))


CASES = {
    "lstm_seq": _case_lstm_seq,          # train fwd+bwd
    "z": _case_z,                        # train fwd+bwd (on-chip PRNG)
    "ag_heads": _case_ag_heads,          # train fwd+bwd (default ON)
    "ce_flash": _ce_case("fused_linear_ce"),
    "ce_hybrid": _ce_case("fused_linear_ce_hybrid"),
    "ce_xla_bwd": _ce_case("fused_linear_ce_xla_bwd"),
    "lstm_step": _case_lstm_step,        # decode
    "logits_topk": _case_logits_topk,    # decode (default ON, k>4)
    "logits_topk_maxM": _case_logits_topk_maxM,  # VMEM-limit headroom
    "logits_topk_int8": _case_logits_topk_int8,
    "logits_sample": _case_logits_sample,
    "topk_lse": _case_topk_lse,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=list(CASES),
                   help="subset of kernels to smoke")
    args = p.parse_args(argv)

    from vae_captioning_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    _require_tpu()

    import jax
    failures = []
    for name in args.only:
        build = CASES[name]
        t0 = time.monotonic()
        try:
            fn, fargs = build()
            fn.lower(*fargs).compile()
            print(f"PASS {name}: compiled in "
                  f"{time.monotonic() - t0:.1f}s", flush=True)
        except Exception as e:  # keep sweeping — report every failure
            failures.append(name)
            msg = f"{type(e).__name__}: {e}"
            print(f"FAIL {name} after {time.monotonic() - t0:.1f}s — "
                  f"{msg[:500]}", flush=True)
    if failures:
        print(f"{len(failures)} kernel(s) failed Mosaic compile: "
              f"{failures}", flush=True)
        return 1
    platforms = "/".join(sorted({d.platform for d in jax.devices()}))
    print(f"all {len(args.only)} kernels compile on {platforms}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
