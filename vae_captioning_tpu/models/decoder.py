"""Caption decoder p(x | z, f(I)): conditional LSTM language model.

Rebuilds ``vae_model/decoder.py:34-143`` TPU-first.  The init-state
protocol is kept: step the cell on the embedded image feature, optionally
on the embedded cluster vector, then on the z-projection; the resulting
carry seeds teacher-forced training and incremental decoding alike
(``:96-114``).  In ``no_encoder`` (baseline LSTM) mode z is skipped
(``:103-106``).

The TF1 ``rnn_placeholders`` state-injection trick is unnecessary: decode
carries the LSTM state PyTree explicitly (see ops/decoding.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_captioning_tpu.ops.lstm import Carry, LSTMStack


class Decoder(nn.Module):
    vocab_size: int
    embed_size: int
    hidden_size: int
    num_layers: int = 1
    use_c_v: bool = False
    dec_keep_rate: float = 1.0     # caption-input dropout keep rate (ref :85-87)
    dec_lstm_drop: float = 1.0     # LSTM output dropout keep rate (ref :88-95)
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.embed_size,
                                  name="dec_embeddings")
        self.lstm = LSTMStack(self.hidden_size, self.num_layers,
                              self.compute_dtype,
                              output_keep_rate=self.dec_lstm_drop,
                              name="lstm")
        self.z_proj = nn.Dense(self.embed_size, name="z_rnn")  # ref :111-112
        self.logits_head = nn.Dense(self.vocab_size, name="rnn_logits",
                                    dtype=self.compute_dtype,
                                    param_dtype=jnp.float32)

    # ------------------------------------------------------------------
    def init_state(
        self,
        images_fv: jax.Array,              # [B, E]
        c_emb: Optional[jax.Array] = None,  # [B, E]
        z_flat: Optional[jax.Array] = None,  # [B, K_z * L]; None = no_encoder
        deterministic: bool = True,
    ) -> Carry:
        carry = self.lstm.zero_carry(images_fv.shape[0])
        carry, _ = self.lstm.step(carry, images_fv, deterministic)
        if c_emb is not None and self.use_c_v:
            carry, _ = self.lstm.step(carry, c_emb, deterministic)
        if z_flat is not None:
            z_dec = self.z_proj(z_flat)
            carry, _ = self.lstm.step(carry, z_dec, deterministic)
        return carry

    # ------------------------------------------------------------------
    def teacher_forcing(
        self,
        carry: Carry,
        dec_inputs: jax.Array,   # [B, T] (<BOS> w1 ...)
        lengths: jax.Array,      # [B]
        deterministic: bool = True,
        return_hidden: bool = False,
    ) -> jax.Array:
        """Full-sequence logits [B, T, V] (fp32), or the pre-projection
        hidden states [B, T, H] when ``return_hidden`` (input to the
        fused linear-CE kernel, ops/fused_ce.py)."""
        x = self.embedding(dec_inputs)
        if self.dec_keep_rate < 1.0 and not deterministic:
            keep = self.dec_keep_rate
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        _, outputs = self.lstm(carry, x, lengths, deterministic)
        if return_hidden:
            return outputs
        return self.logits_head(outputs).astype(jnp.float32)

    # ------------------------------------------------------------------
    def step(self, carry: Carry, tokens: jax.Array) -> Tuple[Carry, jax.Array]:
        """One decode step: tokens [B] → (carry, logits [B, V])."""
        x = self.embedding(tokens)
        carry, h = self.lstm.step(carry, x, deterministic=True)
        return carry, self.logits_head(h).astype(jnp.float32)

    def step_hidden(self, carry: Carry,
                    tokens: jax.Array) -> Tuple[Carry, jax.Array]:
        """Decode step stopping at the hidden state [B, H] — the input to
        the fused logits+top-K Pallas kernel (ops/fused_logits_topk.py),
        which applies the rnn_logits projection itself."""
        x = self.embedding(tokens)
        carry, h = self.lstm.step(carry, x, deterministic=True)
        return carry, h
