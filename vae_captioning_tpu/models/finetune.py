"""End-to-end fine-tune model: VGG16 backbone + CVAE head in one module.

The reference's fine-tune mode (``main.py:46-89``): raw 224×224 images
feed VGG16 under scope ``cnn`` (with dropout + L2 regularization while
training), fc2 features feed the captioning graph; two optimizers update
disjoint variable sets, with ``fine_tune_fe`` / ``fine_tune_top`` gating
conv vs fc trainability (``utils/image_embeddings.py:16-19``).

Here: one module with params tree ``{'vgg16': …, 'cvae': …}``; the
optimizer routes ``vgg16/conv*`` and ``vgg16/fc*`` to separate
(possibly frozen) chains — see ``train.make_finetune_optimizer``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_captioning_tpu.config import Config
from vae_captioning_tpu.models.cvae import CVAEModel
from vae_captioning_tpu.models.vgg16 import VGG16
from vae_captioning_tpu.ops.lstm import Carry


class FineTuneModel(nn.Module):
    config: Config

    @classmethod
    def from_config(cls, cfg: Config) -> "FineTuneModel":
        return cls(config=cfg)

    def setup(self):
        cfg = self.config
        self.vgg16 = VGG16(
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            dropout_keep=cfg.cnn_dropout if cfg.mode == "training" else 1.0,
            trainable_top=True,  # enables dropout gating as in the ref
            name="vgg16")
        self.cvae = CVAEModel.from_config(cfg)

    # ------------------------------------------------------------------
    def extract_features(self, images: jax.Array,
                         deterministic: bool = True) -> jax.Array:
        return self.vgg16(images, deterministic)

    def __call__(self, images: jax.Array, enc_captions: jax.Array,
                 dec_captions: jax.Array, lengths: jax.Array,
                 c_v: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 return_hidden: bool = False,
                 time_major: bool = False) -> Dict[str, jax.Array]:
        features = self.vgg16(images, deterministic)
        return self.cvae(features, enc_captions, dec_captions, lengths, c_v,
                         deterministic, return_hidden, time_major)

    def decode_init(self, images: jax.Array,
                    c_v: Optional[jax.Array] = None) -> Carry:
        features = self.vgg16(images, deterministic=True)
        return self.cvae.decode_init(features, c_v)

    def decode_step(self, carry: Carry,
                    tokens: jax.Array) -> Tuple[Carry, jax.Array]:
        return self.cvae.decode_step(carry, tokens)

    def decode_step_hidden(self, carry: Carry,
                           tokens: jax.Array) -> Tuple[Carry, jax.Array]:
        return self.cvae.decode_step_hidden(carry, tokens)


def load_vgg_into_params(params: Any, weights_path: str) -> Any:
    """Replace the ``vgg16`` subtree with the Caffe-npz ImageNet weights
    (ref main.py:205-208 loads them on every fresh run)."""
    from vae_captioning_tpu.models.vgg16 import load_npz_weights

    loaded = load_npz_weights(weights_path)
    new_params = dict(params)
    new_params["vgg16"] = jax.tree.map(jnp.asarray, loaded)
    return new_params
