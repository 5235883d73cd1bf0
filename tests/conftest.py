"""Test config: force an 8-virtual-device CPU mesh before JAX initializes.

This is the standard JAX way to exercise multi-chip sharding logic without
TPU hardware (SURVEY §4).  Must run before any `import jax` resolves a
backend, hence module scope in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The axon environment pins JAX_PLATFORMS=axon via a site hook that wins
# over the env var — force the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-dominated
# (~20 s per jitted-model test), so re-runs during development hit the
# cache and the wall time collapses.  Repo-local dir, gitignored.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import json  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_dp_mesh():
    """The kernel-shard dp mesh is process-global state that Trainer
    legitimately sets for its lifetime (parallel/kernel_shard.py) — but a
    test that builds a Trainer (e.g. the e2e CLI tests) must not leak an
    8-virtual-device mesh into later tests' single-device assertions
    (test_kernel_shard saw 'sharded' where it asserted 'single')."""
    yield
    from vae_captioning_tpu.parallel import kernel_shard
    kernel_shard.set_dp_mesh(None)


# ----------------------------------------------------------------------
# synthetic mini-COCO (SURVEY §4: fabricated fixture so no real dataset
# is needed)
# ----------------------------------------------------------------------

_CAPTION_BANK = [
    "A man riding a horse on the beach.",
    "Two dogs play with a red ball in the park.",
    "A group of people sitting around a wooden table.",
    "The cat sleeps on a warm laptop keyboard!",
    "A bus is parked next to the train station.",
    "Fresh fruit and vegetables at an outdoor market.",
    "A surfer rides a large wave in the ocean.",
    "Children flying kites on a windy afternoon.",
    "A plate of pasta with tomato sauce and cheese.",
    "An airplane flying over snow covered mountains.",
]


def _write_split(root, split, n_images, with_instances=True, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images", split)
    os.makedirs(img_dir, exist_ok=True)
    images, annotations, inst_annotations = [], [], []
    ann_id = seed * 10000
    for i in range(n_images):
        imid = seed * 1000 + i
        fn = f"COCO_{split}_{imid:012d}.jpg"
        arr = rng.integers(0, 255, size=(64, 48, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(img_dir, fn), arr)
        images.append({"id": imid, "file_name": fn,
                       "height": 64, "width": 48})
        for k in range(5):
            ann_id += 1
            annotations.append({
                "id": ann_id, "image_id": imid,
                "caption": _CAPTION_BANK[(i + k) % len(_CAPTION_BANK)],
            })
        if with_instances:
            for cat in rng.choice(np.arange(1, 91), size=rng.integers(1, 4),
                                  replace=False):
                ann_id += 1
                inst_annotations.append({
                    "id": ann_id, "image_id": imid,
                    "category_id": int(cat), "bbox": [0, 0, 10, 10],
                })
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, f"captions_{split}.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    if with_instances:
        with open(os.path.join(ann_dir, f"instances_{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": inst_annotations}, f)
    return images


@pytest.fixture(scope="session")
def mini_coco(tmp_path_factory):
    """10-train / 6-val / 4-test synthetic COCO tree."""
    root = str(tmp_path_factory.mktemp("mini_coco"))
    _write_split(root, "train2014", 10, seed=1)
    _write_split(root, "val2014", 6, seed=2)
    test_images = _write_split(root, "test2014", 4, with_instances=False,
                               seed=3)
    # test split: image_info only, no captions
    os.remove(os.path.join(root, "annotations", "captions_test2014.json"))
    with open(os.path.join(root, "annotations",
                           "image_info_test2014.json"), "w") as f:
        json.dump({"images": test_images}, f)
    return root


@pytest.fixture(scope="session")
def vgg_npz(tmp_path_factory):
    """Synthetic vgg16_weights.npz with the Caffe-converted key layout
    (conv1_1_W … fc8_b; loader must consume the first 30 sorted arrays,
    ref utils/image_embeddings.py:240-246)."""
    rng = np.random.default_rng(0)
    shapes = {
        "conv1_1": (3, 3, 3, 64), "conv1_2": (3, 3, 64, 64),
        "conv2_1": (3, 3, 64, 128), "conv2_2": (3, 3, 128, 128),
        "conv3_1": (3, 3, 128, 256), "conv3_2": (3, 3, 256, 256),
        "conv3_3": (3, 3, 256, 256),
        "conv4_1": (3, 3, 256, 512), "conv4_2": (3, 3, 512, 512),
        "conv4_3": (3, 3, 512, 512),
        "conv5_1": (3, 3, 512, 512), "conv5_2": (3, 3, 512, 512),
        "conv5_3": (3, 3, 512, 512),
    }
    arrays = {}
    for name, shape in shapes.items():
        arrays[f"{name}_W"] = rng.normal(0, 0.01, size=shape).astype(np.float32)
        arrays[f"{name}_b"] = rng.normal(0, 0.01, size=shape[-1]).astype(np.float32)
    # uniform float32 generation: the big fc6 array (25088×4096) costs
    # seconds with normal(); only shapes/values-roundtrip matter here
    for fc, sh in (("fc6", (25088, 4096)), ("fc7", (4096, 4096)),
                   ("fc8", (4096, 1000))):
        arrays[f"{fc}_W"] = (rng.random(sh, dtype=np.float32) - 0.5) * 0.02
        arrays[f"{fc}_b"] = (rng.random(sh[1], dtype=np.float32) - 0.5) * 0.02
    path = str(tmp_path_factory.mktemp("weights") / "vgg16_weights.npz")
    np.savez(path, **arrays)
    return path
