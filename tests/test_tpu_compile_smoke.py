"""Relay-gated Mosaic compile smoke (slow tier).

Runs ``benchmarks/tpu_compile_smoke.py`` in a subprocess with the
conftest CPU pin removed, so every production Pallas kernel is lowered
by the REAL TPU toolchain.  Skips (not fails) when no TPU backend is
reachable — the script exits 75 (EX_TEMPFAIL) in that case.

VERDICT r4 #2 closure, made permanent: "bit-identical in interpret
mode" can never again masquerade as shippable (the round-4
``bitonic_merge`` lesson — ``rev`` interprets fine, Mosaic rejects it).
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_production_kernels_compile_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # the axon relay registers its backend via a site dir; include it if
    # present so the subprocess can reach the TPU (no-op elsewhere)
    axon_site = "/root/.axon_site"
    if os.path.isdir(axon_site):
        env["PYTHONPATH"] = os.pathsep.join(
            x for x in (env.get("PYTHONPATH"), _REPO, axon_site) if x)
    proc = subprocess.run(
        [sys.executable,
         os.path.join(_REPO, "benchmarks", "tpu_compile_smoke.py")],
        capture_output=True, text=True, timeout=3000, env=env, cwd=_REPO)
    tail = (proc.stdout + proc.stderr)[-4000:]
    if proc.returncode == 75:
        pytest.skip(f"no TPU backend reachable: {tail[-300:]}")
    assert proc.returncode == 0, tail
    assert "all " in proc.stdout and "kernels compile" in proc.stdout, tail
