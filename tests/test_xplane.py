"""xplane trace reader: parse a real jax.profiler capture (CPU plane)
and a hand-built protobuf; exercise the CLI."""

import io
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_captioning_tpu.utils import xplane


def _varint(x):
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(fn, payload):
    return _varint((fn << 3) | 2) + _varint(len(payload)) + payload


def _vi(fn, v):
    return _varint(fn << 3) + _varint(v)


def _synthetic_trace(tmp_path):
    """One plane 'TPU:0' with ops foo (2 events, 5+7ps) and bar (1, 100)."""
    md_foo = _ld(2, _ld(1, _vi(1, 1) + _ld(2, b"foo")))
    md_bar = _ld(2, _ld(1, _vi(1, 2) + _ld(2, b"bar")))
    # map entries: XPlane.event_metadata = 4, entry {1: key, 2: XEventMetadata}
    m1 = _ld(4, _vi(1, 1) + _ld(2, _vi(1, 1) + _ld(2, b"foo")))
    m2 = _ld(4, _vi(1, 2) + _ld(2, _vi(1, 2) + _ld(2, b"bar")))
    ev = lambda mid, dur: _ld(4, _vi(1, mid) + _vi(3, dur))
    line = _ld(3, _ld(2, b"line0") + ev(1, 5) + ev(2, 100) + ev(1, 7))
    plane = _ld(1, _ld(2, b"/device:TPU:0") + m1 + m2 + line)
    path = os.path.join(str(tmp_path), "t.xplane.pb")
    with open(path, "wb") as f:
        f.write(plane)
    return path


def test_aggregate_synthetic(tmp_path):
    path = _synthetic_trace(tmp_path)
    stats = xplane.aggregate(path)
    assert "/device:TPU:0" in stats
    ops = {o.name: o for o in stats["/device:TPU:0"]}
    assert ops["foo"].duration_ps == 12 and ops["foo"].count == 2
    assert ops["bar"].duration_ps == 100 and ops["bar"].count == 1
    # most-expensive first
    assert stats["/device:TPU:0"][0].name == "bar"
    report = xplane.format_report(stats, top=5)
    assert "bar" in report and "foo" in report


def test_aggregate_real_capture(tmp_path):
    """End-to-end: capture a real trace of a jitted op and find a
    non-empty plane with events."""
    trace_dir = str(tmp_path / "trace")

    @jax.jit
    def f(x):
        return jnp.sin(x) @ x.T

    x = jnp.ones((256, 256))
    np.asarray(f(x))
    with jax.profiler.trace(trace_dir):
        np.asarray(f(x))
    stats = xplane.aggregate(trace_dir)
    assert stats, "no planes parsed"
    assert any(ops for ops in stats.values()), "no events parsed"
    # resolve_trace_path accepts both dir and file
    f_path = xplane.resolve_trace_path(trace_dir)
    assert xplane.aggregate(f_path)


def test_cli(tmp_path, capsys):
    path = _synthetic_trace(tmp_path)
    xplane.main([path, "--top", "3", "--plane", "TPU"])
    out = capsys.readouterr().out
    assert "bar" in out and "/device:TPU:0" in out


def test_enable_compile_cache(tmp_path, monkeypatch):
    """The shared cache helper honors explicit path > env > repo default,
    creates the directory, and points jax's config at it."""
    import jax

    from vae_captioning_tpu.utils.compile_cache import enable_compile_cache

    explicit = tmp_path / "explicit"
    assert enable_compile_cache(str(explicit)) == str(explicit)
    assert explicit.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(explicit)

    env_dir = tmp_path / "from_env"
    monkeypatch.setenv("VCT_COMPILE_CACHE", str(env_dir))
    assert enable_compile_cache() == str(env_dir)
    assert env_dir.is_dir()

    monkeypatch.delenv("VCT_COMPILE_CACHE")
    default = enable_compile_cache()
    assert default.endswith(".jax_bench_cache") or ".cache" in default
    # restore: later tests/processes must not inherit a tmp dir
    jax.config.update("jax_compilation_cache_dir", default)
