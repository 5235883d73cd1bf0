"""Cluster ("object") vectors: 91-dim normalized detection indicators.

Reimplements the reference's two notebooks
(``prepare_cluster_vectors_train_val.ipynb`` — ground-truth instances;
``prepare_test_vectors.ipynb`` — detector outputs) as library functions +
a CLI, since the produced ``obj_vectors/c_v*.pickle`` payloads are absent
from the reference mirror and must be regenerated.

Per image: the set of COCO category ids present (1..90) becomes a 91-dim
indicator over ids 0..90, normalized to sum to 1.  Images with no
instances get the zero vector (the batcher's fallback,
ref ``utils/batch_gen.py:113-118``).  Consumers drop index 0
(``c_v[:, 1:]``, ref ``ops/inference.py:21`` / ``main.py:236``).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

NUM_CATEGORIES = 91  # COCO category ids occupy 0..90 (80 used)


def build_from_instances(instances_json: str) -> Dict[str, np.ndarray]:
    """Ground-truth cluster vectors from a COCO ``instances_*2014.json``."""
    with open(instances_json) as f:
        j = json.load(f)
    id_to_fn = {img["id"]: img["file_name"] for img in j["images"]}
    cats_per_image: Dict[int, set] = {}
    for ann in j.get("annotations", []):
        cats_per_image.setdefault(ann["image_id"], set()).add(ann["category_id"])
    vectors: Dict[str, np.ndarray] = {}
    for imid, fn in id_to_fn.items():
        vec = np.zeros(NUM_CATEGORIES, dtype=np.float32)
        for cat in cats_per_image.get(imid, ()):  # ids already in 1..90
            vec[cat] = 1.0
        total = vec.sum()
        if total > 0:
            vec /= total
        vectors[fn] = vec
    return vectors


def build_from_detections(
    detections: Iterable[Tuple[str, Iterable[Tuple[int, float]]]],
    score_threshold: float = 0.5,
) -> Dict[str, np.ndarray]:
    """Detector-based vectors (test split, ref prepare_test_vectors.ipynb).

    ``detections``: iterable of (file_name, [(category_id, score), ...]).
    Categories above the score threshold become the indicator set.
    """
    vectors: Dict[str, np.ndarray] = {}
    for fn, dets in detections:
        vec = np.zeros(NUM_CATEGORIES, dtype=np.float32)
        for cat, score in dets:
            if score >= score_threshold:
                vec[int(cat)] = 1.0
        total = vec.sum()
        if total > 0:
            vec /= total
        vectors[fn] = vec
    return vectors


# ----------------------------------------------------------------------
# storage: npz (ours) with reference-pickle fallback
# ----------------------------------------------------------------------

def save(vectors: Dict[str, np.ndarray], path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith(".pickle") or path.endswith(".pkl"):
        with open(path, "wb") as f:
            pickle.dump(vectors, f)
    else:
        names = sorted(vectors)
        arr = np.stack([vectors[n] for n in names]).astype(np.float32)
        np.savez_compressed(path, names=np.array(names), vectors=arr)


def load(path: str) -> Dict[str, np.ndarray]:
    """Load from our npz or the reference's pickle-of-dict format."""
    if path.endswith(".pickle") or path.endswith(".pkl"):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if not isinstance(payload, dict):
            raise ValueError("cluster vector pickle must contain a dict")
        return {k: np.asarray(v, dtype=np.float32).reshape(-1)
                for k, v in payload.items()}
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    return {str(n): v for n, v in zip(data["names"], data["vectors"])}


def lookup_batch(vectors: Optional[Dict[str, np.ndarray]],
                 filenames: Iterable[str]) -> Tuple[np.ndarray, int]:
    """Batch lookup with zero-vector fallback for undetected images
    (ref utils/batch_gen.py:113-118).

    Returns ``(array, n_fallbacks)``.  A missing vector silently degrades
    c_v-conditioned quality, so the count is surfaced per call; the
    batcher attaches it to each ``Batch`` and the inference driver
    aggregates per split (VERDICT r2 #7).  Per-call counting — rather
    than a module global — is what makes the report correct when batches
    are produced on a prefetch thread (ADVICE r3: a global reset raced
    with in-flight prefetched batches)."""
    out = []
    n_fallbacks = 0
    for fn in filenames:
        key = os.path.basename(fn)
        if vectors is not None and key in vectors:
            out.append(vectors[key])
        else:
            n_fallbacks += 1
            out.append(np.zeros(NUM_CATEGORIES, dtype=np.float32))
    return np.stack(out), n_fallbacks


def load_detections_json(path: str):
    """Read a detections JSON (COCO results format:
    ``[{"image_id"|"file_name", "category_id", "score"}]``) into the
    (file_name, [(cat, score), ...]) shape ``build_from_detections``
    expects.  ``file_name`` wins over ``image_id`` when both present."""
    import json as _json

    with open(path) as f:
        dets = _json.load(f)
    per_image: Dict[str, list] = {}
    for d in dets:
        key = d.get("file_name") or str(d["image_id"])
        per_image.setdefault(key, []).append(
            (int(d["category_id"]), float(d.get("score", 1.0))))
    return per_image.items()


def category_index(instances_json: str) -> Dict[int, str]:
    """COCO category id → name map (the reference ships this as
    ``obj_vectors/category_index.pickle``; we derive it from the
    instances annotations' ``categories`` section)."""
    with open(instances_json) as f:
        j = json.load(f)
    return {c["id"]: c["name"] for c in j.get("categories", [])}


def main(argv=None) -> None:
    """CLI: build cluster vectors from COCO instances (train/val) or a
    detections JSON (test split, ref prepare_test_vectors.ipynb)."""
    import argparse

    p = argparse.ArgumentParser(description="Build cluster vectors from COCO "
                                "instances annotations or detector outputs")
    p.add_argument("--instances_json", nargs="+", default=[],
                   help="instances_*.json files (merged; ground truth)")
    p.add_argument("--detections_json", default=None,
                   help="COCO-results-format detections (test split)")
    p.add_argument("--score_threshold", type=float, default=0.5)
    p.add_argument("--output", required=True,
                   help="output path (.npz or .pickle)")
    args = p.parse_args(argv)
    if not args.instances_json and not args.detections_json:
        p.error("provide --instances_json and/or --detections_json")
    merged: Dict[str, np.ndarray] = {}
    for path in args.instances_json:
        merged.update(build_from_instances(path))
    if args.detections_json:
        merged.update(build_from_detections(
            load_detections_json(args.detections_json),
            args.score_threshold))
    save(merged, args.output)
    print(f"wrote {len(merged)} cluster vectors to {args.output}")


if __name__ == "__main__":
    main()
