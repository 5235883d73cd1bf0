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
    use_fused_seq: bool = False
    use_bias_fold: bool = False  # train-path logits: ones-augmented
    #                              matmul so XLA's dW fusion yields db
    #                              as its last row (Config.ce_bias_fold)

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.embed_size,
                                  name="dec_embeddings")
        self.lstm = LSTMStack(self.hidden_size, self.num_layers,
                              self.compute_dtype,
                              output_keep_rate=self.dec_lstm_drop,
                              use_fused_seq=self.use_fused_seq,
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
        z_dec: Optional[jax.Array] = None,  # [B, E] pre-projected z input
    ) -> Carry:
        carry = self.lstm.zero_carry(images_fv.shape[0])
        carry, _ = self.lstm.step(carry, images_fv, deterministic)
        if c_emb is not None and self.use_c_v:
            carry, _ = self.lstm.step(carry, c_emb, deterministic)
        if z_dec is None and z_flat is not None:
            z_dec = self.z_proj(z_flat)
        if z_dec is not None:
            carry, _ = self.lstm.step(carry, z_dec, deterministic)
        return carry

    # ------------------------------------------------------------------
    def gen_z_embedding(self, rng: jax.Array, z_mean: jax.Array,
                        std, n_samples: int) -> jax.Array:
        """Generation-time z step input [B, E], sampled in the PROJECTED
        space.

        At decode, z only enters through the linear ``z_proj``:
        ``z_proj(concat of K_z iid draws of N(z_mean, std²I))`` is
        Gaussian with mean ``z_mean @ Σ_s W_s + b`` and covariance
        ``std²·WᵀW`` (W: [K_z·L, E]) — so an E-dim draw shaped by a
        Cholesky factor of WᵀW is distributionally identical to drawing
        all K_z·L latents.  At reference dims that replaces a
        [B, 100·150] threefry draw (measured 1.7 ms of the 1.9 ms
        decode_init at B=2048) with a [B, 256] one.  A tiny diagonal
        jitter (1e-6·max(diag)) keeps the factorization stable; at
        std = 0.1 it is noise-level-irrelevant."""
        kernel = self.z_proj.variables["params"]["kernel"]  # [K_z·L, E]
        bias = self.z_proj.variables["params"]["bias"]
        L = z_mean.shape[-1]
        E = kernel.shape[-1]
        w_sum = kernel.reshape(n_samples, L, E).sum(axis=0)  # [L, E]
        mean_part = jax.lax.dot_general(
            z_mean, w_sum, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST) + bias
        cov = jax.lax.dot_general(
            kernel, kernel, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)             # [E, E]
        jitter = 1e-6 * jnp.max(jnp.diagonal(cov))
        chol = jnp.linalg.cholesky(cov + jitter * jnp.eye(E))
        eps = jax.random.normal(rng, (z_mean.shape[0], E))
        noise = jax.lax.dot_general(
            eps, chol, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)             # eps @ cholᵀ
        return mean_part + jnp.asarray(std, jnp.float32) * noise

    # ------------------------------------------------------------------
    def sample_z_embedding_fused(self, rng: jax.Array, q_mean: jax.Array,
                                 q_std: jax.Array,
                                 n_samples: int) -> jax.Array:
        """TRAIN-time z step input [B, E]: the K_z reparameterized
        draws and the ``z_proj`` matmul fused in one Pallas kernel
        (on-chip PRNG; ops/fused_z.py) — the [B, K_z·L] samples never
        reach HBM.  Same N(q_mean, q_std²) law as the plain path,
        different random stream.  Unlike ``gen_z_embedding`` (decode:
        scalar std → one E-dim projected draw), the per-example q_std
        makes the projected covariance example-dependent, so the draws
        stay in latent space but are consumed tile-by-tile."""
        # dp shard_map wrapper: per-shard rows + shard-distinct PRNG
        # streams on a >1-device mesh (parallel/kernel_shard.py)
        from vae_captioning_tpu.parallel.kernel_shard import sample_project
        kernel = self.z_proj.variables["params"]["kernel"]
        bias = self.z_proj.variables["params"]["bias"]
        seed = jax.lax.bitcast_convert_type(
            jax.random.key_data(rng).reshape(2), jnp.int32)
        return sample_project(seed, q_mean, q_std, kernel, bias,
                              n_samples)

    # ------------------------------------------------------------------
    def teacher_forcing(
        self,
        carry: Carry,
        dec_inputs: jax.Array,   # [B, T] (<BOS> w1 ...)
        lengths: jax.Array,      # [B]
        deterministic: bool = True,
        return_hidden: bool = False,
        time_major: bool = False,
    ) -> jax.Array:
        """Full-sequence logits [B, T, V] in COMPUTE dtype, or the
        pre-projection hidden states [B, T, H] when ``return_hidden``
        (input to the fused linear-CE kernel, ops/fused_ce.py).
        ``time_major=True`` returns [T, B, V] / [T, B, H] — the scan's
        native layout; the train step uses it so no [·, ·, H] relayout
        copies sit between the LSTM scan, the logits head, and the CE
        (pair it with transposed [T, B] labels).

        The head computes in compute dtype (bf16 on TPU), so an
        astype(f32) here adds no precision — it only doubles the HBM
        bytes of the largest tensor in the train step (the round-3
        xplane trace showed one fusion writing BOTH an f32 and a bf16
        [B·K, T, V] copy).  ``compute_loss`` upcasts inside its
        reductions instead."""
        x = self.embedding(dec_inputs)
        if self.dec_keep_rate < 1.0 and not deterministic:
            keep = self.dec_keep_rate
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        _, outputs = self.lstm(carry, x, lengths, deterministic,
                               time_major_out=time_major)
        if return_hidden:
            return outputs
        if self.use_bias_fold and not self.is_initializing():
            # Fold the rnn_logits bias into the weight matrix: logits =
            # [h ‖ 1] @ [[W], [b]].  Same bf16 compute class as the
            # Dense (bias rounds once through the f32 MXU accumulator
            # instead of once in the bf16 epilogue add), but the
            # BACKWARD changes structurally: db is the last row of the
            # dW' dot instead of XLA's standalone [N, V] column-sum —
            # which re-reads the 707 MB logits AND recomputes dl for
            # 0.94 ms/step in the round-5 trace.  Param tree unchanged
            # (the Dense branch runs at init), so checkpoints are
            # unaffected.
            w = self.logits_head.variables["params"]["kernel"]
            b = self.logits_head.variables["params"]["bias"]
            dt = self.compute_dtype
            ones = jnp.ones((*outputs.shape[:-1], 1), dt)
            hb = jnp.concatenate([outputs.astype(dt), ones], axis=-1)
            wb = jnp.concatenate([w, b[None, :]], axis=0).astype(dt)
            return jax.lax.dot_general(
                hb, wb, (((hb.ndim - 1,), (0,)), ((), ())))
        return self.logits_head(outputs)

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
