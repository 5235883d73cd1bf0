"""Small layer helpers.

``HighwayNetwork`` mirrors the reference's ``highway_network``
(``utils/rnn_model.py:53-74`` — present there but never called; kept in
the capability surface as a usable, tested module):

  y = g · relu(W_h x + b_h) + (1 − g) · x,   g = sigmoid(W_t x + b_t)

with the reference's −1.0 transform-gate bias init (biases the network
toward carry behaviour early in training).
"""

from __future__ import annotations

import flax.linen as nn
import jax


class HighwayNetwork(nn.Module):
    num_layers: int = 1
    transform_bias_init: float = -1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        for i in range(self.num_layers):
            h = nn.relu(nn.Dense(features, name=f"h_{i}")(x))
            gate = nn.sigmoid(nn.Dense(
                features, name=f"t_{i}",
                bias_init=nn.initializers.constant(
                    self.transform_bias_init))(x))
            x = gate * h + (1.0 - gate) * x
        return x
