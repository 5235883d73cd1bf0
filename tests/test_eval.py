"""Scorer tests: BLEU/CIDEr-D sanity properties + the COCO-eval JSON
entry point, and the metrics logger."""

import json
import math

import pytest

from vae_captioning_tpu.eval.scorers import (
    cider_d, corpus_bleu, score_captions_json)


REFS = {
    "1": ["a man rides a horse on the beach",
          "a person riding a horse near the ocean"],
    "2": ["two dogs play with a red ball",
          "dogs playing with a ball in the park"],
    "3": ["a bus parked at the station",
          "a large bus near a train station"],
}


def test_bleu_perfect_match():
    hyps = {k: v[0] for k, v in REFS.items()}
    scores = corpus_bleu(hyps, REFS)
    assert all(s == pytest.approx(1.0) for s in scores)


def test_bleu_no_overlap():
    hyps = {k: "zzz qqq xxx www vvv" for k in REFS}
    scores = corpus_bleu(hyps, REFS)
    assert scores[0] == pytest.approx(0.0, abs=1e-6)


def test_bleu_orders_quality():
    good = {"1": "a man rides a horse on the beach",
            "2": "two dogs play with a ball",
            "3": "a bus parked near the station"}
    bad = {"1": "a man walks", "2": "dogs", "3": "the the the the"}
    g = corpus_bleu(good, REFS)
    b = corpus_bleu(bad, REFS)
    assert g[3] > b[3]


def test_bleu_brevity_penalty():
    # a 2-word prefix of an 8-word reference must be penalized
    hyps = {"1": "a man"}
    refs = {"1": ["a man rides a horse on the beach"]}
    s = corpus_bleu(hyps, refs)
    assert s[0] < math.exp(1 - 8 / 2) + 1e-9  # bp bound


def test_cider_identical_beats_partial():
    hyps_perfect = {k: v[0] for k, v in REFS.items()}
    hyps_partial = {"1": "a man on the beach", "2": "two dogs in the park",
                    "3": "a bus"}
    perfect = cider_d(hyps_perfect, REFS)
    partial = cider_d(hyps_partial, REFS)
    assert perfect > partial > 0.0
    assert perfect <= 10.0 + 1e-6


def test_cider_zero_for_disjoint():
    hyps = {k: "zzz qqq" for k in REFS}
    assert cider_d(hyps, REFS) == pytest.approx(0.0, abs=1e-6)


def test_score_captions_json(tmp_path):
    results = [{"image_id": 10, "caption": "A man rides a horse."},
               {"image_id": 11, "caption": "Two dogs play."}]
    gt = {"images": [{"id": 10, "file_name": "a.jpg"},
                     {"id": 11, "file_name": "b.jpg"}],
          "annotations": [
              {"id": 1, "image_id": 10, "caption": "a man rides a horse"},
              {"id": 2, "image_id": 10, "caption": "a person on a horse"},
              {"id": 3, "image_id": 11, "caption": "two dogs play outside"},
              {"id": 4, "image_id": 11, "caption": "dogs playing"}]}
    rp = tmp_path / "results.json"
    gp = tmp_path / "gt.json"
    rp.write_text(json.dumps(results))
    gp.write_text(json.dumps(gt))
    out = score_captions_json(str(rp), str(gp))
    assert out["scored_images"] == 2
    assert out["BLEU-1"] > 0.8
    assert out["CIDEr-D"] > 0.0


def test_metric_logger(tmp_path):
    from vae_captioning_tpu.utils.logging import MetricLogger
    logger = MetricLogger(str(tmp_path), echo=False, run_name="t")
    logger.log(1, {"loss": 1.5}, epoch=0)
    logger.log(2, {"loss": 1.2}, epoch=0)
    logger.close()
    lines = (tmp_path / "t.metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 2 and rec["loss"] == 1.2
