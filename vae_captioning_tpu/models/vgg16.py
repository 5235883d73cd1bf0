"""VGG16 vision backbone in Flax.

Mirrors the reference's hand-written TF1 VGG16
(``utils/image_embeddings.py:14-238``): 13 conv layers in 5 blocks with
2×2 max-pool, fc1/fc2 (4096) — fc2 (post-ReLU) is the image feature.
ImageNet mean subtraction with the same hard-coded RGB means
(``:30-34``) happens inside the module, so callers feed raw [0,255] RGB.

``load_npz_weights`` consumes the Caffe-converted ``vgg16_weights.npz``
by sorted key order, first 30 arrays (``:240-246``) — fc8 (the 1000-way
classifier) is dropped.  TF's ``[3,3,in,out]`` conv layout and NHWC
flatten order match Flax's HWIO/NHWC, so weights map over unchanged.

TPU notes: convs run in ``compute_dtype`` (bfloat16) with fp32
accumulation; dropout on fc1/fc2 only when the top is trainable, as in
the reference (``:225-226,236-237``).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels) per conv layer; pools after each block
_CONV_BLOCKS = (
    (("conv1_1", 64), ("conv1_2", 64)),
    (("conv2_1", 128), ("conv2_2", 128)),
    (("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256)),
    (("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512)),
    (("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)),
)

_IMAGENET_MEAN = (123.68, 116.779, 103.939)  # RGB, ref :31-33


class VGG16(nn.Module):
    """Feature extractor: images [B, 224, 224, 3] (RGB, 0..255) → fc2 [B, 4096]."""

    compute_dtype: Any = jnp.float32
    dropout_keep: float = 1.0       # keep rate; applied only if trainable_top
    trainable_top: bool = False     # gates dropout exactly like the ref

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> jax.Array:
        # subtract in f32 regardless of input dtype: uint8 images (the
        # packed stores ship raw pixels) must NOT wrap modulo 256, and
        # f32 images keep the pre-round subtraction this always had
        x = images.astype(jnp.float32) - jnp.asarray(_IMAGENET_MEAN,
                                                     jnp.float32)
        x = x.astype(self.compute_dtype)
        for block in _CONV_BLOCKS:
            for name, features in block:
                x = nn.Conv(features, (3, 3), padding="SAME", name=name,
                            dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        x = x.reshape((x.shape[0], -1))  # NHWC flatten, matches TF order
        x = nn.relu(nn.Dense(4096, name="fc1", dtype=self.compute_dtype,
                             param_dtype=jnp.float32)(x))
        x = self._dropout(x, deterministic)
        x = nn.relu(nn.Dense(4096, name="fc2", dtype=self.compute_dtype,
                             param_dtype=jnp.float32)(x))
        x = self._dropout(x, deterministic)
        return x.astype(jnp.float32)

    def _dropout(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if not self.trainable_top or self.dropout_keep >= 1.0 or deterministic:
            return x
        keep = self.dropout_keep
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


def load_npz_weights(weights_path: str) -> Dict[str, Any]:
    """Load the Caffe-converted npz into a VGG16 params dict.

    Key layout: ``conv1_1_W ... conv5_3_b, fc6_W, fc6_b, fc7_W, fc7_b,
    fc8_*`` — sorted order puts all conv arrays first, then fc6..fc8; the
    reference assigns the first 30 sorted arrays positionally
    (``utils/image_embeddings.py:240-246``).  We map by name, asserting
    the same shapes, and drop fc8.
    """
    raw = np.load(weights_path)
    params: Dict[str, Any] = {}
    for block in _CONV_BLOCKS:
        for name, features in block:
            kernel = np.asarray(raw[f"{name}_W"], np.float32)
            bias = np.asarray(raw[f"{name}_b"], np.float32)
            if kernel.shape[-1] != features:
                raise ValueError(
                    f"{name}: expected {features} filters, got {kernel.shape}")
            params[name] = {"kernel": kernel, "bias": bias}
    params["fc1"] = {"kernel": np.asarray(raw["fc6_W"], np.float32),
                     "bias": np.asarray(raw["fc6_b"], np.float32)}
    params["fc2"] = {"kernel": np.asarray(raw["fc7_W"], np.float32),
                     "bias": np.asarray(raw["fc7_b"], np.float32)}
    if params["fc1"]["kernel"].shape != (25088, 4096):
        raise ValueError("fc6 kernel must be [25088, 4096] "
                         f"(got {params['fc1']['kernel'].shape})")
    return params
