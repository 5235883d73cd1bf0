"""CVAE recognition network q(z | x, f(I)) with Normal / GMM / AG heads.

Rebuilds ``vae_model/encoder.py:24-110`` TPU-first:

  * The LSTM init-state protocol is preserved: step the cell once on the
    embedded image feature, optionally once more on the embedded cluster
    vector, then run the caption (``:38-48``).
  * The 90 per-cluster (μ, logσ) heads of GMM/AG are **one** dense
    producing ``[B, 90, L]`` — one MXU matmul instead of 90 tiny layers
    (``:76-99`` builds 90 separate variable scopes).
  * GMM cluster selection: the reference passes the probability vector
    to ``tf.multinomial``, which expects *logits* — effectively sampling
    near-uniformly (``:72``).  We sample from the actual categorical
    distribution over c_v (zero-sum vectors fall back to uniform);
    documented deviation, CIDEr-validated.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_captioning_tpu.ops.lstm import LSTMStack


class Encoder(nn.Module):
    vocab_size: int
    embed_size: int
    hidden_size: int
    latent_size: int
    num_layers: int = 1
    prior: str = "Normal"          # Normal | GMM | AG
    num_clusters: int = 90
    use_c_v: bool = False
    compute_dtype: Any = jnp.float32
    use_fused_seq: bool = False
    use_fused_heads: bool = False  # AG only: ops/fused_ag_heads.py

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.embed_size,
                                  name="enc_embeddings")
        self.lstm = LSTMStack(self.hidden_size, self.num_layers,
                              self.compute_dtype,
                              use_fused_seq=self.use_fused_seq, name="lstm")
        # ONE dense for (μ ‖ logσ): the reference builds separate
        # lz_mean/lz_logstd layers (Normal, ref :60-66) and 90 per-cluster
        # variable scopes ×2 (GMM/AG, ref :76-99) — here all heads are a
        # single [H, 2·K·L] matmul so the MXU sees one large dot and XLA
        # fuses the exp/combine epilogue into its output (train-step
        # "misc bucket" lever, PERF.md round-4)
        half = (self.latent_size if self.prior == "Normal"
                else self.num_clusters * self.latent_size)
        self.q_heads = nn.Dense(2 * half, name="q_heads")
        self._q_half = half

    def __call__(
        self,
        images_fv: jax.Array,            # [B, E] embedded image feature
        captions: jax.Array,             # [B, T] token ids (w1..wN <EOS>)
        lengths: jax.Array,              # [B]
        c_emb: Optional[jax.Array] = None,   # [B, E] embedded cluster vec
        c_v: Optional[jax.Array] = None,     # [B, 90] raw cluster weights
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns the posterior (mean, std), each [B, L]."""
        B = images_fv.shape[0]
        carry = self.lstm.zero_carry(B)
        carry, _ = self.lstm.step(carry, images_fv)
        if c_emb is not None and self.use_c_v:
            carry, _ = self.lstm.step(carry, c_emb)
        # collect_outputs=False: only the final carry is read below, so
        # the [T, B, H] output stack (63 MB at train shapes) is never
        # materialized
        carry, _ = self.lstm(carry, self.embedding(captions), lengths,
                             collect_outputs=False)
        # the reference reads the FIRST layer's hidden state
        # (final_state[0][1], ref :56-58) — identical at the default one
        # layer, and matched here for multi-layer parity
        h = carry[0][1]

        if (self.prior == "AG" and self.use_fused_heads
                and not self.is_initializing()):
            # heads matmul + exp + c_v combine in ONE Pallas pass — the
            # [B, 2·K·L] q tensor and its two [B, K, L] reshapes (0.66 ms
            # of pure relayout in the round-5 trace) never reach HBM
            # (ops/fused_ag_heads.py; dp shard_map wrapper).  The plain
            # branch below runs at init so q_heads params are created
            # either way.
            from vae_captioning_tpu.parallel.kernel_shard import ag_heads
            assert c_v is not None, "AG prior requires cluster vectors"
            kernel = self.q_heads.variables["params"]["kernel"]
            bias = self.q_heads.variables["params"]["bias"]
            return ag_heads(h, kernel, bias, c_v)

        q = self.q_heads(h)                       # [B, 2·(K·)L] one dot
        raw_mean, raw_logstd = q[:, :self._q_half], q[:, self._q_half:]

        if self.prior == "Normal":
            return raw_mean, jnp.exp(raw_logstd)

        K, L = self.num_clusters, self.latent_size
        means = raw_mean.reshape(B, K, L)
        stds = jnp.exp(raw_logstd).reshape(B, K, L)

        if self.prior == "GMM":
            assert c_v is not None, "GMM prior requires cluster vectors"
            total = jnp.sum(c_v, axis=-1, keepdims=True)
            probs = jnp.where(total > 0, c_v / jnp.maximum(total, 1e-9),
                              jnp.ones_like(c_v) / K)
            cluster = jax.random.categorical(
                self.make_rng("sample"), jnp.log(probs + 1e-9), axis=-1)  # [B]
            # one-hot einsum instead of take_along_axis: XLA's TPU
            # lowering of small per-row gathers serializes through
            # scalar memory (profiled ~66 µs per gather in the decode
            # loop); the masked sum is exact — one factor is 0/1
            oh = jax.nn.one_hot(cluster, K, dtype=means.dtype)   # [B, K]
            # HIGHEST precision: the 0/1 contraction is then exact (TPU
            # default precision would round the heads to bf16)
            hi = jax.lax.Precision.HIGHEST
            mean = jnp.einsum("bk,bkl->bl", oh, means, precision=hi)
            std = jnp.einsum("bk,bkl->bl", oh, stds, precision=hi)
            return mean, std

        # AG: convex combination by the cluster weights (ref :105-107)
        assert c_v is not None, "AG prior requires cluster vectors"
        mean = jnp.einsum("bk,bkl->bl", c_v, means)
        std = jnp.einsum("bk,bkl->bl", c_v, stds)
        return mean, std
