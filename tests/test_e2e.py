"""End-to-end: train on the synthetic mini-COCO through the real CLI,
then run inference mode and validate the COCO-eval JSON outputs —
the reference's full main.py lifecycle (SURVEY §3.1/3.2)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


TINY = [
    "--set", "embed_size=16", "--set", "latent_size=8",
    "--set", "encoder_hidden=16", "--set", "decoder_hidden=16",
    "--set", "gen_z_samples=4", "--set", "num_ex_per_epoch=16",
    "--set", "extract_batch_size=4", "--set", "gen_max_len=8",
    "--set", "keep_words=1",
]


@pytest.fixture(scope="module")
def trained_run(mini_coco, vgg_npz, tmp_path_factory):
    """One tiny training run via the CLI, shared by the checks below."""
    from vae_captioning_tpu.cli import main
    workdir = str(tmp_path_factory.mktemp("e2e"))
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        main(["--mode", "training", "--coco_dir", mini_coco,
              "--epochs", "1", "--bs", "4", "--prior", "AG", "--c_v",
              "--checkpoint", "e2e_run", "--gen_name", "t1",
              "--set", f"image_net_weights_path={vgg_npz}",
              "--set", "gen_val_captions=3", "--beam_size", "3",
              *TINY])
    finally:
        os.chdir(cwd)
    return workdir


def test_training_produces_checkpoint_and_sidecars(trained_run):
    base = os.path.join(trained_run, "checkpoints", "e2e_run")
    assert os.path.exists(os.path.join(base, "config.json"))
    assert os.path.exists(os.path.join(base, "vocab.json"))
    steps = [d for d in os.listdir(base) if d.isdigit()]
    assert steps, f"no checkpoint steps in {os.listdir(base)}"


def test_training_caches_features_and_vocab(trained_run):
    cache = os.path.join(trained_run, "cache")
    assert os.path.exists(os.path.join(cache, "vocab.json"))
    assert os.path.exists(os.path.join(cache, "train2014.features.npz"))
    assert os.path.exists(os.path.join(cache, "val2014.features.npz"))


def test_inference_writes_coco_eval_json(trained_run, mini_coco):
    from vae_captioning_tpu.cli import main
    cwd = os.getcwd()
    os.chdir(trained_run)
    try:
        main(["--mode", "inference", "--coco_dir", mini_coco,
              "--checkpoint", "e2e_run", "--gen_name", "t1",
              "--sample_gen", "beam_search", "--beam_size", "3", *TINY])
    finally:
        os.chdir(cwd)
    val_json = os.path.join(trained_run, "val_t1.json")
    test_json = os.path.join(trained_run, "test_t1.json")
    assert os.path.exists(val_json) and os.path.exists(test_json)
    with open(val_json) as f:
        caps = json.load(f)
    assert len(caps) == 3  # gen_val_captions=3 holdout
    for c in caps:
        assert set(c) == {"image_id", "caption"}
        assert isinstance(c["image_id"], int) and c["image_id"] >= 0
        assert isinstance(c["caption"], str)
        # no control tokens leak into the output text
        assert "<" not in c["caption"]
    with open(test_json) as f:
        test_caps = json.load(f)
    assert len(test_caps) == 4  # all test images
    ids = [c["image_id"] for c in test_caps]
    assert len(set(ids)) == 4


def test_inference_gen_batch_size_invariant(trained_run, mini_coco):
    """--set gen_batch_size=N (TPU-native addition: batch inference at
    the decode-throughput knee, PERF.md round-5 ladders) must produce
    captions identical to the default batch_size decode — batching is a
    throughput lever, never a results change."""
    from vae_captioning_tpu.cli import main
    cwd = os.getcwd()
    os.chdir(trained_run)
    try:
        # independent of the t1-producing test: generate both arms here
        main(["--mode", "inference", "--coco_dir", mini_coco,
              "--checkpoint", "e2e_run", "--gen_name", "t2base",
              "--sample_gen", "beam_search", "--beam_size", "3", *TINY])
        main(["--mode", "inference", "--coco_dir", mini_coco,
              "--checkpoint", "e2e_run", "--gen_name", "t2big",
              "--sample_gen", "beam_search", "--beam_size", "3",
              "--set", "gen_batch_size=8", *TINY])
    finally:
        os.chdir(cwd)

    def by_id(path):
        with open(path) as f:
            return sorted(json.load(f), key=lambda c: c["image_id"])

    for split in ("val", "test"):
        base = by_id(os.path.join(trained_run, f"{split}_t2base.json"))
        big = by_id(os.path.join(trained_run, f"{split}_t2big.json"))
        assert base == big


def test_generator_with_detector_vectors(trained_run, mini_coco, vgg_npz):
    """The single-image API must decode an arbitrary image with a
    detector-derived cluster vector (VERDICT r1 #9: the reference's
    _c_v_generator stub, closed for real) and cache decode fns per beam
    size instead of recompiling (ADVICE r1)."""
    from vae_captioning_tpu.generate import Generator
    img_dir = os.path.join(mini_coco, "images", "test2014")
    img = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    det_json = os.path.join(trained_run, "dets.json")
    with open(det_json, "w") as f:
        json.dump([
            {"file_name": os.path.basename(img), "category_id": 18,
             "score": 0.9},
            {"file_name": os.path.basename(img), "category_id": 3,
             "score": 0.7},
            {"file_name": os.path.basename(img), "category_id": 44,
             "score": 0.2},  # below threshold, dropped
        ], f)
    gen = Generator(os.path.join(trained_run, "checkpoints"), "e2e_run",
                    gen_method="beam_search", weights_path=vgg_npz,
                    detections_json=det_json)
    # the detector vector: cats 18 and 3 set (0.2 < 0.5 threshold)
    vec = gen._det_vectors[os.path.basename(img)]
    assert vec[18] > 0 and vec[3] > 0 and vec[44] == 0
    out = gen.generate_caption(img, beam_size=2)
    assert isinstance(out[0]["caption"], str)
    out3 = gen.generate_caption(img, beam_size=3, return_beams=True)
    assert len(out3[0]["caption"]) == 3  # all beams, best first
    # both beam sizes now cached; repeating must not add entries
    assert set(gen._fns_by_beam) >= {2, 3}
    n = len(gen._fns_by_beam)
    gen.generate_caption(img, beam_size=2)
    assert len(gen._fns_by_beam) == n


def test_restore_continues_from_checkpoint(trained_run, mini_coco, vgg_npz):
    from vae_captioning_tpu.cli import main
    cwd = os.getcwd()
    os.chdir(trained_run)
    try:
        main(["--mode", "training", "--coco_dir", mini_coco,
              "--epochs", "1", "--bs", "4", "--prior", "AG", "--c_v",
              "--checkpoint", "e2e_run", "--restore",
              "--set", f"image_net_weights_path={vgg_npz}",
              "--set", "gen_val_captions=3", *TINY])
    finally:
        os.chdir(cwd)
    base = os.path.join(trained_run, "checkpoints", "e2e_run")
    steps = sorted(int(d) for d in os.listdir(base) if d.isdigit())
    assert steps[-1] > 5  # continued past the first run's final step
