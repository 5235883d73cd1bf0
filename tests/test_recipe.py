"""Smoke-test the published-recipe script itself (VERDICT r2 #1b).

``examples/reference_recipe.sh`` is the one-command path that will carry
the eventual real-COCO CIDEr-parity run (train → beam-10 inference →
validated scoring, ref README.md:15-19).  The e2e tests drive the same
CLI surfaces, but the *script* — its arg plumbing, env overrides, and
the three-stage chaining — was previously never executed by any test,
so its first run would have been the 20-epoch expensive one.  This test
executes the actual script against the synthetic mini-COCO with tiny
dims injected via RECIPE_EXTRA_ARGS, asserting all three stages succeed
and the scorer emits the metric dict the real run will be judged on."""

import json
import os
import re
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_recipe_script_runs(mini_coco, vgg_npz, tmp_path):
    script = os.path.join(REPO, "examples", "reference_recipe.sh")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # same virtual-CPU-device setup as conftest (the script spawns fresh
    # python processes that don't inherit the in-process jax config)
    env["JAX_PLATFORMS"] = "cpu"
    env["VCT_PLATFORM"] = "cpu"  # the CLI's own override — beats site
    # hooks that pin jax_platforms (JAX_PLATFORMS alone loses to them)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["RECIPE_EXTRA_ARGS"] = " ".join([
        "--epochs", "1", "--bs", "4",
        "--set", "embed_size=16", "--set", "latent_size=8",
        "--set", "encoder_hidden=16", "--set", "decoder_hidden=16",
        "--set", "gen_z_samples=4", "--set", "num_ex_per_epoch=16",
        "--set", "extract_batch_size=4", "--set", "gen_max_len=8",
        "--set", "keep_words=1", "--set", "gen_val_captions=3",
        "--set", "beam_size=2",   # last --set wins over the script's 10
    ])
    proc = subprocess.run(
        ["bash", script, mini_coco, vgg_npz, "recipe_smoke"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=1800)
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])

    # stage 2 artifacts: COCO-eval JSONs for both splits
    val_json = tmp_path / "val_recipe_smoke.json"
    test_json = tmp_path / "test_recipe_smoke.json"
    assert val_json.exists() and test_json.exists()
    results = json.loads(val_json.read_text())
    assert results and {"image_id", "caption"} <= set(results[0])

    # stage 3: the scorer printed a metric dict including CIDEr-D —
    # the number the real run compares to the reference's ~0.8
    m = re.search(r"\{[^{}]*\"CIDEr-D\"[^{}]*\}", proc.stdout, re.S)
    assert m, proc.stdout[-3000:]
    metrics = json.loads(m.group(0))
    for key in ("BLEU-1", "BLEU-4", "ROUGE-L", "CIDEr-D"):
        assert key in metrics and isinstance(metrics[key], float)
    assert metrics["scored_images"] == 3
