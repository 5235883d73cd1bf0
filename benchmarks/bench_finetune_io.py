"""End-to-end fine-tune pipeline benchmark: disk → native loader →
host batch assembly → device step, all overlapped.

SURVEY §3.1's two hot loops are the offline feature extraction (#0) and
the train step fed by a synchronous Python pipeline (#1).  The rebuild's
claim is that the async stack (C++ mmap/thread-pool RawImageStore with
page prefetch + the Prefetcher thread + pipelined dispatch) makes the
fine-tune step cost ≈ max(compute, IO), not compute + IO.  This harness
measures that end-to-end on a synthetic 224² image pack:

  1. writes N random JPEGs, packs them with pack_images_to_raw,
  2. builds the production Batcher (image_store = RawImageStore,
     K captions/image, cluster vectors) and a fine-tune Trainer,
  3. times the steady-state wall per step over the real fit loop
     machinery (Prefetcher + run_step, metrics fetched once at the end).

Compare against the compute-only fine-tune step from bench_device.py
(36.2 ms marginal at B=32).  Run ON TPU:

    python benchmarks/bench_finetune_io.py [--images 1024] [--steps 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset(root: str, n_images: int, k: int, vocab: int, t_len: int):
    import cv2

    from vae_captioning_tpu.data.native_loader import (RawImageStore,
                                                       pack_images_to_raw)

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(n_images):
        fn = f"img_{i:06d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fn),
                    rng.integers(0, 255, (224, 224, 3), np.uint8))
        names.append(fn)
    out_bin = os.path.join(root, "pack.bin")
    pack_images_to_raw([img_dir], out_bin)
    store = RawImageStore(out_bin, num_threads=8)

    captions = {}
    cluster_vectors = {}
    for fn in names:
        caps = []
        for _ in range(k):
            L = int(rng.integers(6, t_len - 2))
            caps.append([1] + rng.integers(3, vocab, L).tolist() + [2])
        captions[fn] = caps
        cv = rng.random(91).astype(np.float32)  # 91-dim; batcher drops idx 0
        cluster_vectors[fn] = cv / cv.sum()
    return names, captions, cluster_vectors, store


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=1024)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--bs", type=int, default=32)
    args = p.parse_args(argv)

    import jax

    from vae_captioning_tpu.config import Config
    from vae_captioning_tpu.data.batcher import CaptionBatcher
    from vae_captioning_tpu.train import Trainer
    from vae_captioning_tpu.utils.prefetch import Prefetcher

    VOCAB, K = 11500, 5
    cfg = Config(prior="AG", use_c_v=True, fine_tune=True,
                 fine_tune_fe=True, fine_tune_top=True,
                 batch_size=args.bs, num_captions=K,
                 image_net_weights_path="/nonexistent")
    cfg.vocab_size = VOCAB

    root = tempfile.mkdtemp(prefix="ft_io_")
    t0 = time.perf_counter()
    names, captions, cvs, store = build_dataset(root, args.images, K,
                                                VOCAB, 24)
    print(f"dataset built in {time.perf_counter() - t0:.1f}s "
          f"({args.images} images)", file=sys.stderr)

    batcher = CaptionBatcher(names, captions, args.bs, image_store=store,
                      cluster_vectors=cvs)
    trainer = Trainer(cfg)

    def step_stream():
        # mirror Trainer.fit: batch assembly AND device_put ride the
        # prefetch thread, overlapping the transfer with device compute
        def device_batches():
            while True:
                for b in batcher.train_batches(K):
                    yield trainer._device_batch(b)
        return Prefetcher(device_batches(), cfg.prefetch_batches)

    stream = step_stream()
    # warmup: compile + fill the pipeline
    for _ in range(6):
        m = trainer.run_step_arrays(next(stream))
    float(m["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        m = trainer.run_step_arrays(next(stream))
    float(m["loss"])  # one sync at the end
    dt = (time.perf_counter() - t0) / args.steps
    store.close()
    print(json.dumps({
        "component": "finetune_e2e_step",
        "ms_per_step": round(dt * 1000, 2),
        "images_per_sec": round(args.bs / dt, 1),
        "batch": args.bs,
        "note": "disk->native loader->host batch->device, pipelined; "
                "compare bench_device.py finetune_step (compute only)",
    }))


if __name__ == "__main__":
    main()
