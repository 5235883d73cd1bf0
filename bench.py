"""Benchmark: COCO-style caption generation throughput, beam=3, per chip.

Headline metric from BASELINE.md: the driver north-star is >5k images/sec
on a v5e-8 at beam 3 → 625 captions/sec/chip.  ``vs_baseline`` is
measured-value / 625.

Runs the flagship AG-CVAE (reference default dims: embed 256, LSTM 512,
latent 150, 100 z samples, vocab ~11.5k) end-to-end on device: features →
cluster-conditioned z draw → init state → batched beam search, one jit,
no host round-trips inside the timed region.

Timeout-proof progressive emission (VERDICT r3 #1): round 3's single
all-or-nothing batch-4096 run hit the driver timeout (rc 124) and left NO
metric line.  Now the bench

1. compiles + times a SMALL batch (512) first and prints its metric JSON
   line immediately (flushed) — a number exists within the first compile;
2. upgrades through 1024, 4096 and 8192 to 32768 (the measured
   per-chip knee),
   printing the better line after each stage, and skips an upgrade whose
   projected cost (setup scaled sublinearly at batch_ratio**0.5 +
   iterations scaled linearly, x1.15 headroom) does not fit the
   remaining budget;
3. runs a watchdog thread that, at ``VCT_BENCH_BUDGET_S`` seconds
   (default 720), re-prints the best-so-far line and ``os._exit(0)`` —
   so even a hung stage-2 compile leaves exit code 0 and a parseable
   final line.

Every metric line has the same shape; later lines are always >= earlier
ones (best-so-far), so whichever line a log parser takes is valid.

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
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent executable cache (VERDICT r4 #3).  Round-5 relay evidence:
# warm-cache stage-0 setup 36 s (vs ~140 s fresh) and all three
# progressive stages inside 123 s wall (benchmarks/tpu_r5_logs/bench.err)
# — an earlier session had measured the cache ineffective, which no
# longer holds.  Shared dir with every other entry point via the helper.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vae_captioning_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  ".jax_bench_cache"))

BASELINE_PER_CHIP = 625.0  # 5000 img/s on 8 chips
# Estimated one-time in-process setup paid only by stage 0 (first Pallas
# kernel compiles through the remote compile service ~140 s; measured
# 2026-08-18, NEXT.md env notes).  Subtracted from stage-0 setup before
# projecting upgrade cost (ADVICE r4).
_ONE_TIME_SETUP_S = 140.0
BEAM = 3
# progressive batch schedule: 512 puts a FIRST metric line on stdout at
# the earliest possible moment (smallest useful compile through the
# relay; still ~20x baseline); 1024 compiles in ~2-3 min; 32768 is the
# measured per-chip knee once the fused top-K kernel's scoped-VMEM
# limit covers the larger row counts (same-process A/B ladder
# 2026-08-19: 4096 -> 33.5k, 8192 -> 37.8k (+12.8%), 16384 -> 40.5k,
# 32768 -> 41.5-42.7k, 65536 -> 43.0k (+0.7%, not worth 2x latency);
# the 32768 executable compiles in 26-32 s — the round-2 ">9 min"
# figure predates the remote compile service + persistent cache).
# 16384 is skipped: its marginal gain straddles run-to-run noise and
# every stage costs driver budget.  The projection gate still skips an
# upgrade the remaining budget can't fit.
BATCHES = (512, 1024, 4096, 8192, 32768)
GEN_MAX_LEN = 30
VOCAB = 11500

_start = time.monotonic()
_best = {"value": -1.0, "line": None}
_best_lock = threading.Lock()


def _log(msg: str) -> None:
    """Progress note on stderr (never after a metric line on the exit
    path — the final stdout line must stay the metric JSON)."""
    print(f"[bench +{time.monotonic() - _start:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _emit(metric: str, per_chip: float) -> None:
    """Print a metric line iff it improves on the best so far."""
    with _best_lock:
        if per_chip <= _best["value"]:
            return
        line = json.dumps({
            "metric": metric,
            "value": round(per_chip, 2),
            "unit": "captions/sec/chip",
            "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
        })
        _best["value"] = per_chip
        _best["line"] = line
    print(line, flush=True)


def _exit_with_best(code: int = 0) -> None:
    """Re-print the best-so-far line (so it is the LAST stdout line even
    if stderr noise followed the original print) and hard-exit."""
    with _best_lock:
        if _best["line"] is not None:
            print(_best["line"], flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)


_watchdog: threading.Timer | None = None


def _arm_watchdog(budget_s: float) -> threading.Timer:
    """Arm (and remember, so tests can cancel) the budget watchdog.

    The timer survives the arming scope — anything embedding main()
    (e.g. the contract tests) must cancel ``_watchdog`` afterwards or
    the REAL os._exit fires later in the host process.
    """
    global _watchdog

    def fire():
        _log(f"watchdog: budget {budget_s:.0f}s reached, exiting with "
             f"best-so-far")
        _exit_with_best(0)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()
    _watchdog = t
    return t


def _probe_backend(timeout_s: float) -> str:
    """Ask a SUBPROCESS what backend jax resolves to, with a hard timeout.

    When the axon relay is down, ``jax.devices()`` hangs >570 s (observed
    for whole sessions) — probing in-process would eat the entire budget
    and leave no metric line at all.  A subprocess can be killed.  Returns
    the platform string ("tpu", "cpu", ...) or "timeout".
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        out = r.stdout.strip().splitlines()
        return out[-1] if (r.returncode == 0 and out) else "error"
    except subprocess.TimeoutExpired:
        return "timeout"


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


def _make_inputs(cfg, batch: int, rng, trained_pool=None):
    if trained_pool is not None:
        anchors, cvs = trained_pool
        ids = rng.integers(0, anchors.shape[0], batch)
        features = anchors[ids] + 0.05 * rng.normal(
            size=(batch, cfg.cnn_feature_size)).astype(np.float32)
        return jnp.asarray(features), jnp.asarray(cvs[ids])
    features = jnp.asarray(rng.normal(size=(batch, cfg.cnn_feature_size))
                           .astype(np.float32))
    c_v = rng.random((batch, cfg.num_clusters)).astype(np.float32)
    c_v = jnp.asarray(c_v / c_v.sum(-1, keepdims=True))
    return features, c_v


def _time_decode(beam_fn, params, features, c_v,
                 iters: int) -> tuple[float, float]:
    """Returns (median_iteration_s, setup_s).

    setup_s covers the two warmup calls — i.e. compile + weight/input
    upload + first execution — and is reported separately because it is
    the ~entire stage cost through the relay (stage-0 at batch 512:
    345 s setup vs 0.11 s of timed iterations, measured 2026-08-18) and
    it scales very differently with batch than the iteration time does.
    """
    key = jax.random.PRNGKey(0)
    # warmup / compile.  NOTE: on the axon relay, block_until_ready alone
    # does not force remote execution — a host transfer does, so timing
    # fetches the token array each iteration (61 KB, negligible).
    t_setup = time.perf_counter()
    for i in range(2):
        tokens, scores = beam_fn(params, features, c_v,
                                 jax.random.fold_in(key, 100 + i))
        np.asarray(tokens)
    setup_s = time.perf_counter() - t_setup

    # median per-iteration time: robust to transient relay/queue
    # contention (observed run-to-run swings on the shared tunnel)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        tokens, scores = beam_fn(params, features, c_v,
                                 jax.random.fold_in(key, i))
        np.asarray(tokens)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), setup_s


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
    p.add_argument("--batches", type=int, nargs="+", default=None,
                   help="progressive batch schedule (each stage emits a "
                        "best-so-far metric line); default "
                        f"{list(BATCHES)} on TPU, [64] on the CPU "
                        "fallback (CPU throughput drops with batch)")
    p.add_argument("--vocab", type=int, default=VOCAB)
    p.add_argument("--budget", type=float,
                   default=float(os.environ.get("VCT_BENCH_BUDGET_S", 720)),
                   help="wall-clock budget in seconds; at budget the "
                        "watchdog prints the best line and exits 0")
    args = p.parse_args(argv)
    vocab_size = args.vocab
    _arm_watchdog(args.budget)

    metric = ("captions_per_sec_per_chip_beam3"
              + ("_trained" if args.trained else ""))

    # Relay-down insurance: if the TPU backend never answers (the axon
    # relay was down for entire sessions in round 4), pin jax to CPU and
    # emit an HONESTLY-LABELED fallback line instead of hanging in
    # jax.devices() until the watchdog fires with no metric at all.
    # CPU beam-3 ≈ 38 caps/s at batch 64 (measured 2026-08-18) — the
    # `_cpu_fallback` suffix keeps it from reading as a TPU regression.
    probe_timeout = float(os.environ.get("VCT_BENCH_PROBE_TIMEOUT_S", 300))
    platform = _probe_backend(min(probe_timeout, max(args.budget - 120, 30)))
    _log(f"backend probe: {platform}")
    batches = args.batches
    if platform != "tpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        metric += "_cpu_fallback"
        # CPU throughput DROPS with batch (38 caps/s @64 vs 33 @256);
        # one small stage is the best the fallback can do.  An explicit
        # --batches still wins (the contract tests rely on this).
        if batches is None:
            batches = [64]
    if batches is None:
        batches = list(BATCHES)

    cfg = Config(prior="AG", use_c_v=True, beam_size=BEAM,
                 gen_max_len=GEN_MAX_LEN, sample_gen="beam_search")
    cfg.vocab_size = vocab_size
    # a synthetic vocab of the right size (ids drive shapes only)
    vocab = Vocabulary(["<BOS>", "<EOS>", "<UNK>"]
                       + [f"w{i}" for i in range(vocab_size - 4)])
    assert vocab.vocab_size == vocab_size

    _log(f"init model (devices={len(jax.devices())}, "
         f"backend={jax.default_backend()})")
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    trained_pool = None
    if args.trained:
        params, anchors, cvs = _train_synthetic(cfg, model, params, vocab,
                                                args.trained)
        trained_pool = (anchors, cvs)
    fns = make_decode_fns(CVAEModel.from_config(cfg), cfg, vocab)
    beam_fn = fns["beam_search"]

    n_chips = len(jax.devices())
    prev = None  # (batch, setup_s, iter_s, stage) of the completed stage
    for stage, batch in enumerate(batches):
        iters = 3 if stage == 0 else (5 if batch < batches[-1] else 9)
        # Skip an upgrade stage we clearly can't finish.  A stage's cost
        # through the relay is ~all setup (compile + upload + first
        # call): batch 512 measured 345 s setup vs 0.11 s of timed
        # iterations (2026-08-18).  Setup grows SUBLINEARLY in batch
        # (measured 4096/1024 executable-compile ratio ~2x over 4x
        # batch, i.e. ~ratio**0.5), and stage 0 additionally pays
        # ONE-TIME in-process costs (first Pallas compiles ~140 s,
        # backend init ~50 s) that upgrades never repeat — so when
        # projecting FROM stage 0 those are subtracted first (ADVICE r4
        # medium: without the subtraction the committed run's 345 s
        # stage-0 setup projected 562 s > 430 s left and the 512->1024
        # upgrade was still always skipped; with it, (345-140)*sqrt(2)
        # = 290 s fits).  Iterations project linearly on ITER count only
        # — the two warmup executions are already inside the setup term
        # (ADVICE r4 low: the old (iters+2) double-counted them).  1.15x
        # headroom; a mispredicted stage costs nothing worse than the
        # watchdog re-printing the already-emitted best line and exiting
        # 0 (ADVICE r4 low #3: accepted — earlier lines always exist).
        elapsed = time.monotonic() - _start
        if prev is not None:
            pb, psetup, piter, pstage = prev
            ratio = batch / pb
            psetup_eff = psetup - _ONE_TIME_SETUP_S if pstage == 0 \
                else psetup
            psetup_eff = max(psetup_eff, 0.2 * psetup)
            projected = psetup_eff * ratio ** 0.5 + piter * ratio * iters
            if args.budget - elapsed < 1.15 * projected:
                _log(f"skip batch {batch}: projected {projected:.0f}s "
                     f"x1.15 > {args.budget - elapsed:.0f}s left of "
                     f"{args.budget:.0f}s budget")
                break
        _log(f"stage {stage}: batch {batch} compile+time")
        features, c_v = _make_inputs(cfg, batch, rng, trained_pool)
        dt, setup_s = _time_decode(beam_fn, params, features, c_v, iters)
        prev = (batch, setup_s, dt, stage)
        per_chip = batch / dt / n_chips
        _log(f"stage {stage}: batch {batch} -> {dt * 1e3:.2f} ms/iter, "
             f"{per_chip:.0f} caps/s/chip ({setup_s:.0f}s setup "
             f"+ {dt * iters:.1f}s timed)")
        _emit(metric, per_chip)

    _exit_with_best(0)


if __name__ == "__main__":
    main()
