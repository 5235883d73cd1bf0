"""Synthetic end-to-end training demo: learn to caption from features.

Builds a *learnable* synthetic dataset — each image's feature vector is a
noisy embedding of 2-3 objects, and its captions are templated sentences
naming those objects — then trains the AG-CVAE with the production
Trainer, decodes HELD-OUT images with batched beam search, and scores
them with the in-repo BLEU/CIDEr-D.

This demonstrates generalization (not memorization) through the real
train/decode/score path without MS-COCO.  Run:

    python examples/synthetic_train_demo.py [--steps 400] [--images 200]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vae_captioning_tpu.config import Config
from vae_captioning_tpu.data.batcher import Batch
from vae_captioning_tpu.data.tokenizer import tokenize_caption
from vae_captioning_tpu.data.vocabulary import Vocabulary
from vae_captioning_tpu.eval.scorers import cider_d, corpus_bleu
from vae_captioning_tpu.inference import make_decode_fns
from vae_captioning_tpu.models.cvae import CVAEModel
from vae_captioning_tpu.ops.decoding import tokens_to_text
from vae_captioning_tpu.train import (
    TrainState, _flatten_batch, init_model, make_optimizer, make_train_step)

OBJECTS = ["dog", "cat", "horse", "bus", "car", "boat", "bird", "bear",
           "pizza", "kite", "clock", "vase", "bench", "laptop", "bottle"]
SCENES = ["park", "beach", "street", "kitchen", "field"]
TEMPLATES = ["a {0} and a {1} in the {2}", "the {0} near a {1} at the {2}",
             "a photo of a {0} with a {1} in the {2}"]

# --hard corpus (VERDICT r1 #3c): the 80 COCO category names, adjective
# slots, plural forms and 8 templates — hundreds of vocabulary words and
# a much larger composition space, so the held-out score measures real
# generalization, not template lookup.
OBJECTS_HARD = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush"]
ADJECTIVES = ["red", "blue", "green", "yellow", "white", "black", "small",
              "large", "tiny", "huge", "old", "shiny", "wooden", "bright",
              "dark", "striped"]
SCENES_HARD = ["park", "beach", "street", "kitchen", "field", "market",
               "station", "bathroom", "bedroom", "garden", "harbor",
               "playground"]
TEMPLATES_HARD = [
    "a {adj} {o1} and a {o2} in the {sc}",
    "the {o1} sits near a {adj} {o2} at the {sc}",
    "a photo of a {o1} beside a {o2} in a {adj} {sc}",
    "two {o1}s with a {adj} {o2} at the {sc}",
    "a {adj} {o1} next to the {o2} near the {sc}",
    "there is a {o1} and a {adj} {o2} by the {sc}",
    "an image of the {adj} {o1} behind a {o2} in the {sc}",
    "some {o1}s around a {o2} inside the {adj} {sc}",
]


def make_dataset(n_images, rng, hard=False):
    objects = OBJECTS_HARD if hard else OBJECTS
    scenes = SCENES_HARD if hard else SCENES
    obj_emb = rng.normal(0, 1, (len(objects), 4096)).astype(np.float32)
    scene_emb = rng.normal(0, 1, (len(scenes), 4096)).astype(np.float32)
    adj_emb = rng.normal(0, 1, (len(ADJECTIVES), 4096)).astype(np.float32)
    feats, caps, cvs = [], [], []
    for _ in range(n_images):
        o1, o2 = rng.choice(len(objects), 2, replace=False)
        sc = rng.integers(len(scenes))
        if hard:
            adj = rng.integers(len(ADJECTIVES))
            feats.append(obj_emb[o1] + obj_emb[o2] + scene_emb[sc]
                         + 0.7 * adj_emb[adj]
                         + rng.normal(0, 0.1, 4096).astype(np.float32))
            k_templates = rng.choice(len(TEMPLATES_HARD), 3, replace=False)
            image_caps = [TEMPLATES_HARD[t].format(
                adj=ADJECTIVES[adj], o1=objects[o1], o2=objects[o2],
                sc=scenes[sc]) for t in k_templates]
        else:
            feats.append(obj_emb[o1] + obj_emb[o2] + scene_emb[sc]
                         + rng.normal(0, 0.1, 4096).astype(np.float32))
            image_caps = [t.format(objects[o1], objects[o2], scenes[sc])
                          for t in TEMPLATES]
        caps.append(image_caps)
        cv = np.zeros(90, np.float32)
        cv[o1 % 90] = cv[o2 % 90] = 0.5  # detected-object vector
        cvs.append(cv)
    return np.stack(feats), caps, np.stack(cvs)


def to_batch(feats, caps_ids, cvs, T=16):
    B = len(caps_ids)
    K = len(caps_ids[0])
    dec = np.zeros((B, K, T), np.int32)
    lab = np.zeros((B, K, T), np.int32)
    lengths = np.zeros((B, K), np.int32)
    for i, image in enumerate(caps_ids):
        for k, cap in enumerate(image):
            n = min(len(cap) - 1, T)
            dec[i, k, :n] = cap[:n]
            lab[i, k, :n] = cap[1:n + 1]
            lengths[i, k] = n
    return Batch(features=feats, dec_inputs=dec, labels=lab,
                 lengths=lengths, cluster_vectors=cvs, valid=B)


def main():
    # VCT_PLATFORM=cpu forces the backend (same override as cli.py; the
    # env var JAX_PLATFORMS alone loses to site hooks that pin a platform)
    platform = os.environ.get("VCT_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--images", type=int, default=200)
    p.add_argument("--holdout", type=int, default=32)
    p.add_argument("--hard", action="store_true",
                   help="80-object/adjective corpus; pair with e.g. "
                        "--images 5000 --holdout 512 --steps 3000")
    p.add_argument("--prior", default="AG", choices=["Normal", "GMM", "AG"])
    p.add_argument("--gmm_true_kl", action="store_true",
                   help="GMM prior only: true mixture KL instead of the "
                        "reference's standard-normal placeholder "
                        "(Config.gmm_true_kl A/B)")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    feats, caps, cvs = make_dataset(args.images + args.holdout, rng,
                                    hard=args.hard)
    vocab = Vocabulary.build(
        (tokenize_caption(c) for image in caps for c in image), keep_words=1)
    caps_ids = [[vocab.encode(tokenize_caption(c)) for c in image]
                for image in caps]

    dims = (dict(embed_size=128, latent_size=32, encoder_hidden=256,
                 decoder_hidden=256, gen_max_len=16)
            if args.hard else
            dict(embed_size=64, latent_size=16, encoder_hidden=128,
                 decoder_hidden=128, gen_max_len=12))
    cfg = Config(prior=args.prior, use_c_v=True, gen_z_samples=8,
                 learning_rate=0.003, std=0.05, beam_size=3,
                 num_captions=3, gmm_true_kl=args.gmm_true_kl, **dims)
    cfg.vocab_size = vocab.vocab_size

    model, params = init_model(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, cfg, donate=False)

    n_train = args.images
    bs = 64
    T = max(len(c) for image in caps_ids for c in image) - 1
    print(f"training on {n_train} images, vocab {vocab.vocab_size}, T={T}")
    for it in range(args.steps):
        idx = rng.choice(n_train, bs, replace=False)
        batch = to_batch(feats[idx], [caps_ids[i] for i in idx], cvs[idx],
                         T=T)
        arrs = [jnp.asarray(x) for x in _flatten_batch(batch)]
        state, m = step(state, *arrs, jax.random.PRNGKey(1))
        if (it + 1) % 100 == 0:
            print(f"step {it+1}: rec_loss={float(m['rec_loss']):.3f} "
                  f"kld={float(m['kld']):.3f}")

    # decode HELD-OUT images
    fns = make_decode_fns(CVAEModel.from_config(cfg), cfg, vocab)
    hf = jnp.asarray(feats[n_train:])
    hc = jnp.asarray(cvs[n_train:])
    tokens, scores = fns["beam_search"](state.params, hf, hc,
                                        jax.random.PRNGKey(9))
    tokens = np.asarray(tokens)
    hyps, refs = {}, {}
    for i in range(args.holdout):
        key = str(i)
        hyps[key] = tokens_to_text(tokens[i], vocab.idx2word, vocab.eos_id,
                                   vocab.bos_id)
        refs[key] = [" ".join(tokenize_caption(c)[1:-1])
                     for c in caps[n_train + i]]
    bleu = corpus_bleu(hyps, refs)
    cider = cider_d(hyps, refs)
    print(f"\nheld-out: BLEU-4={bleu[3]:.3f} CIDEr-D={cider:.3f}")
    for i in range(3):
        print(f"  gen: '{hyps[str(i)]}'  |  ref: '{refs[str(i)][0]}'")
    return cider


if __name__ == "__main__":
    main()
