"""Persistent XLA compilation cache, one switch for every entry point.

Fresh-process Pallas compiles through the axon remote-compile service
cost ~140 s each (NEXT.md env notes); the round-5 relay session measured
the warm-cache effect directly — bench.py stage-0 setup dropped to 36 s
and all three progressive stages finished in 123 s wall
(benchmarks/tpu_r5_logs/bench.err).  Every benchmark harness, the
training/inference CLIs, and the driver entry points call this so the
whole repo shares one cache directory and any script's compile warms the
next one's.

The reference has no analogue (TF1 rebuilds its graph per process);
this is the TPU-native equivalent of its "one long-lived session"
usage pattern.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point jax at a persistent on-disk executable cache; returns the dir.

    Resolution order: explicit ``path`` → ``$VCT_COMPILE_CACHE`` → the
    repo-root ``.jax_bench_cache`` (same directory bench.py has always
    used, so its warmed entries are shared) → ``~/.cache`` fallback when
    the package is installed outside a writable checkout.
    """
    import jax

    if path is None:
        path = os.environ.get("VCT_COMPILE_CACHE")
    if path is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(repo_root, ".jax_bench_cache")
        try:
            os.makedirs(path, exist_ok=True)
        except OSError:
            path = os.path.expanduser("~/.cache/vae_captioning_tpu/xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: the relay's per-compile round-trip, not
    # local compile time, is what the cache amortizes here
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
