"""bench.py progressive-emission contract (VERDICT r3 #1).

The driver parses bench.py's stdout for ONE metric JSON line; round 3's
all-or-nothing bench timed out with none.  These tests pin the
properties the round-4 rewrite guarantees:

* a metric line is printed (flushed) after the FIRST stage, so a kill
  mid-upgrade still leaves a parseable number;
* later lines are best-so-far (monotone non-decreasing value);
* the watchdog re-prints the best line and exits 0 on budget expiry;
* a projected-over-budget upgrade stage is skipped, not attempted.

They run bench.main on the CPU backend with tiny batches/vocab — the
reference-dim model compiles in seconds at batch 8.
"""

import io
import json
import sys
import time

import pytest

import bench


@pytest.fixture()
def no_hard_exit(monkeypatch):
    """os._exit would kill pytest; record the code and unwind instead."""
    codes = []

    def fake_exit(code):
        codes.append(code)
        raise SystemExit(code)

    monkeypatch.setattr(bench.os, "_exit", fake_exit)
    # fresh best-so-far state per test (module-global)
    monkeypatch.setitem(bench._best, "value", -1.0)
    monkeypatch.setitem(bench._best, "line", None)
    monkeypatch.setattr(bench, "_start", time.monotonic())
    yield codes
    # CRITICAL: cancel any timer main()/_arm_watchdog armed.  The
    # monkeypatched os._exit is restored at teardown, so a still-armed
    # Timer would fire the REAL os._exit(0) minutes later — silently
    # killing the pytest process mid-suite with exit code 0 (observed:
    # two full-suite runs "passing" at 28%).
    if bench._watchdog is not None:
        bench._watchdog.cancel()
        bench._watchdog = None


def _metric_lines(captured: str):
    lines = []
    for ln in captured.splitlines():
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        d = json.loads(ln)
        assert set(d) == {"metric", "value", "unit", "vs_baseline"}
        assert d["unit"] == "captions/sec/chip"
        assert d["vs_baseline"] == pytest.approx(
            d["value"] / bench.BASELINE_PER_CHIP, rel=1e-2, abs=5.1e-4)
        lines.append(d)
    return lines


def test_emit_is_best_so_far(no_hard_exit, capsys):
    bench._emit("m", 10.0)
    bench._emit("m", 5.0)    # worse: suppressed
    bench._emit("m", 20.0)
    out = _metric_lines(capsys.readouterr().out)
    assert [d["value"] for d in out] == [10.0, 20.0]
    with pytest.raises(SystemExit):
        bench._exit_with_best(0)
    # the final stdout line is the best line, re-printed
    final = _metric_lines(capsys.readouterr().out)
    assert final[-1]["value"] == 20.0
    assert no_hard_exit == [0]


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_watchdog_exits_zero_with_best(no_hard_exit, capsys):
    bench._emit("m", 7.5)
    capsys.readouterr()
    bench._arm_watchdog(0.05)
    time.sleep(0.8)  # Timer thread raises SystemExit inside itself
    assert no_hard_exit == [0]
    out = _metric_lines(capsys.readouterr().out)
    assert out and out[-1]["value"] == 7.5


def test_main_progressive_lines_and_stage_skip(no_hard_exit, capsys,
                                               monkeypatch):
    """Two fast stages emit two (or one, if stage-2 skipped) lines; a
    third stage whose projected cost exceeds the remaining budget is
    skipped.  _time_decode is stubbed so no model compile happens —
    main()'s loop/emission/skip logic runs for real."""
    calls = []

    def fake_time_decode(beam_fn, params, features, c_v, iters):
        calls.append(features.shape[0])
        time.sleep(0.6)          # give stages measurable wall cost
        return 0.01, 0.6         # (iter_s, setup_s)
    monkeypatch.setattr(bench, "_time_decode", fake_time_decode)
    # the real probe spawns a jax subprocess (30s+ if the relay is down)
    monkeypatch.setattr(bench, "_probe_backend", lambda t: "tpu")

    def fake_init(cfg, key):
        return object(), {}
    monkeypatch.setattr("vae_captioning_tpu.train.init_model", fake_init)
    monkeypatch.setattr(
        "vae_captioning_tpu.inference.make_decode_fns",
        lambda model, cfg, vocab: {"beam_search": None})
    monkeypatch.setattr(
        bench, "_make_inputs",
        lambda cfg, batch, rng, pool=None: (
            __import__("numpy").zeros((batch, 4)), None))

    with pytest.raises(SystemExit):
        # stage-16 setup is stubbed at 0.6s (stage-0's is shielded from
        # the _ONE_TIME_SETUP_S subtraction by the 0.2*psetup floor);
        # stage 4000's projection is 0.6*(4000/16)**0.5 +
        # 0.01*(4000/16)*9 ≈ 32s, x1.15 ≈ 37s > the ~28s left of the
        # 30s budget → skipped
        bench.main(["--batches", "8", "16", "4000", "--vocab", "64",
                    "--budget", "30"])
    assert no_hard_exit == [0]
    assert calls == [8, 16], f"stage-3 should be skipped, ran {calls}"
    out = capsys.readouterr()
    lines = _metric_lines(out.out)
    # batch 16 at the same stubbed dt doubles throughput → a second,
    # strictly better line (plus the exit-path re-print of the best)
    import jax
    n_chips = len(jax.devices())
    vals = [d["value"] for d in lines]
    assert vals[0] == pytest.approx(8 / 0.01 / n_chips, rel=1e-2)
    assert vals[1] == pytest.approx(16 / 0.01 / n_chips, rel=1e-2)
    assert vals == sorted(vals)
    assert "skip batch 4000" in out.err
    assert lines[-1]["metric"] == "captions_per_sec_per_chip_beam3"


def test_main_cpu_fallback_when_relay_down(no_hard_exit, capsys,
                                           monkeypatch):
    """If the backend probe times out (relay down), main pins jax to
    CPU, labels the metric ``_cpu_fallback``, and uses the small CPU
    schedule — an honest parseable line instead of a silent hang."""
    calls = []

    def fake_time_decode(beam_fn, params, features, c_v, iters):
        calls.append(features.shape[0])
        return 0.5, 0.1
    monkeypatch.setattr(bench, "_time_decode", fake_time_decode)
    monkeypatch.setattr(bench, "_probe_backend", lambda t: "timeout")
    monkeypatch.setattr("vae_captioning_tpu.train.init_model",
                        lambda cfg, key: (object(), {}))
    monkeypatch.setattr(
        "vae_captioning_tpu.inference.make_decode_fns",
        lambda model, cfg, vocab: {"beam_search": None})
    monkeypatch.setattr(
        bench, "_make_inputs",
        lambda cfg, batch, rng, pool=None: (
            __import__("numpy").zeros((batch, 4)), None))
    # don't let the fallback's jax.config.update persist into the suite
    import jax
    monkeypatch.setattr(jax.config, "update", lambda *a, **k: None)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    with pytest.raises(SystemExit):
        bench.main(["--vocab", "64", "--budget", "300"])
    assert no_hard_exit == [0]
    assert calls == [64], f"CPU fallback should run one batch-64 stage: {calls}"
    lines = _metric_lines(capsys.readouterr().out)
    assert lines[-1]["metric"] == \
        "captions_per_sec_per_chip_beam3_cpu_fallback"
