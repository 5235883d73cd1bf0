"""The assembled captioning model family + loss.

One Flax module covers all four reference variants (``README.md:5-6``):

  * ``no_encoder=True``  → VGG16+LSTM baseline (no z, rec loss only)
  * ``prior='Normal'``   → CVAE with standard-normal prior
  * ``prior='GMM'``      → GMM-prior CVAE (KL is the Normal formula — the
                           reference's acknowledged TODO, ``main.py:125-135``)
  * ``prior='AG'``       → additive-Gaussian CVAE over cluster vectors

Graph-assembly parity (``main.py:84-117``): a single shared ``imf_emb``
dense maps fc2 features into embedding space for both encoder and
decoder; a single shared ``cv_emb`` embeds cluster vectors; features are
tiled on device when K captions per image are used (``main.py:84-89``).

z handling: K_z = ``gen_z_samples`` reparameterized samples per example,
concatenated per image to ``[B, K_z·L]`` and densely projected — the
clean form of the reference's sample-major reshape
(``vae_model/decoder.py:108-113``; see ops/distributions.sample_gaussian).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vae_captioning_tpu.config import Config
from vae_captioning_tpu.models.decoder import Decoder
from vae_captioning_tpu.models.encoder import Encoder
from vae_captioning_tpu.ops import distributions as dist
from vae_captioning_tpu.ops.lstm import Carry


class CVAEModel(nn.Module):
    """Flagship model.  Construct via ``CVAEModel.from_config(cfg)``."""

    vocab_size: int
    embed_size: int = 256
    latent_size: int = 150
    encoder_hidden: int = 512
    decoder_hidden: int = 512
    encoder_layers: int = 1
    decoder_layers: int = 1
    num_clusters: int = 90
    gen_z_samples: int = 100
    prior: str = "Normal"
    no_encoder: bool = False
    use_c_v: bool = False
    dec_keep_rate: float = 1.0
    dec_lstm_drop: float = 1.0
    decode_std: float = 0.1
    cluster_seed: int = 0
    compute_dtype: Any = jnp.float32
    use_fused_seq: bool = False
    use_fused_z: bool = False
    use_fused_heads: bool = False
    use_bias_fold: bool = False

    @classmethod
    def from_config(cls, cfg: Config) -> "CVAEModel":
        assert cfg.vocab_size, "set cfg.vocab_size (from the Vocabulary) first"
        import jax as _jax
        # normalize before comparing: Config accepts both the string
        # "bfloat16" and jnp.bfloat16 for compute_dtype (ADVICE r3)
        is_bf16 = jnp.dtype(cfg.compute_dtype) == jnp.bfloat16
        on_tpu = _jax.default_backend() == "tpu" or cfg.fused_force
        use_fused_seq = cfg.fused_lstm_seq and on_tpu and is_bf16
        use_fused_z = cfg.fused_z and on_tpu and is_bf16
        use_fused_heads = (cfg.fused_heads and on_tpu and is_bf16
                           and cfg.prior == "AG")
        # pure XLA, no TPU gate — but only worthwhile (and only changes
        # the backward schedule) when the train step takes the logits
        # branch, so honor the flag as given
        use_bias_fold = cfg.ce_bias_fold
        return cls(
            vocab_size=cfg.vocab_size,
            embed_size=cfg.embed_size,
            latent_size=cfg.latent_size,
            encoder_hidden=cfg.encoder_hidden,
            decoder_hidden=cfg.decoder_hidden,
            encoder_layers=cfg.encoder_rnn_layers,
            decoder_layers=cfg.decoder_rnn_layers,
            num_clusters=cfg.num_clusters,
            gen_z_samples=cfg.gen_z_samples,
            prior=cfg.prior,
            no_encoder=cfg.no_encoder,
            use_c_v=cfg.use_c_v,
            dec_keep_rate=cfg.dec_keep_rate,
            dec_lstm_drop=cfg.dec_lstm_drop,
            decode_std=cfg.std,
            cluster_seed=cfg.seed,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            use_fused_seq=use_fused_seq,
            use_fused_z=use_fused_z,
            use_fused_heads=use_fused_heads,
            use_bias_fold=use_bias_fold,
        )

    # ------------------------------------------------------------------
    def setup(self):
        self.imf_emb = nn.Dense(self.embed_size, name="imf_emb")  # main.py:94
        if self._needs_c_v:
            self.cv_emb = nn.Dense(self.embed_size, name="cv_emb")  # main.py:108
        if not self.no_encoder:
            self.encoder = Encoder(
                vocab_size=self.vocab_size, embed_size=self.embed_size,
                hidden_size=self.encoder_hidden, latent_size=self.latent_size,
                num_layers=self.encoder_layers, prior=self.prior,
                num_clusters=self.num_clusters, use_c_v=self.use_c_v,
                compute_dtype=self.compute_dtype,
                use_fused_seq=self.use_fused_seq,
                use_fused_heads=self.use_fused_heads, name="encoder")
        self.decoder = Decoder(
            vocab_size=self.vocab_size, embed_size=self.embed_size,
            hidden_size=self.decoder_hidden, num_layers=self.decoder_layers,
            use_c_v=self.use_c_v, dec_keep_rate=self.dec_keep_rate,
            dec_lstm_drop=self.dec_lstm_drop,
            compute_dtype=self.compute_dtype,
            use_fused_seq=self.use_fused_seq,
            use_bias_fold=self.use_bias_fold, name="decoder")
        # fixed (non-trainable) cluster means, deterministic in the seed —
        # replaces the pickled matrix of utils/vae_utils.py:6-31
        self.cluster_means = jnp.asarray(dist.init_cluster_means(
            self.num_clusters, self.latent_size, self.cluster_seed))

    @property
    def _needs_c_v(self) -> bool:
        return self.use_c_v or self.prior in ("GMM", "AG")

    # ------------------------------------------------------------------
    def _embed_conditioning(self, features: jax.Array,
                            c_v: Optional[jax.Array]):
        images_fv = self.imf_emb(features)
        c_emb = None
        if self._needs_c_v and c_v is not None:
            c_emb = self.cv_emb(c_v)
        return images_fv, c_emb

    # ------------------------------------------------------------------
    def __call__(
        self,
        features: jax.Array,       # [B, 4096] fc2 features
        enc_captions: jax.Array,   # [B*K, T]  (w1..wN <EOS>) — encoder input
        dec_captions: jax.Array,   # [B*K, T]  (<BOS> w1..wN) — decoder input
        lengths: jax.Array,        # [B*K]
        c_v: Optional[jax.Array] = None,  # [B, 90]
        deterministic: bool = True,
        return_hidden: bool = False,
        time_major: bool = False,
    ) -> Dict[str, jax.Array]:
        """Training/eval forward.  K = captions per image is inferred from
        the leading dims and features are tiled on device (main.py:84-89).
        ``return_hidden`` yields out['hidden'] ([B·K, T, H], pre-logits)
        instead of out['logits'] for the fused-CE loss path.
        ``time_major`` flips logits/hidden to [T, B·K, ·] (the LSTM
        scan's native layout — the train step uses it with transposed
        labels; see compute_loss)."""
        B = features.shape[0]
        K = enc_captions.shape[0] // B
        images_fv, c_emb = self._embed_conditioning(features, c_v)
        if K > 1:
            images_fv = jnp.repeat(images_fv, K, axis=0)
            c_emb = None if c_emb is None else jnp.repeat(c_emb, K, axis=0)
            c_v = None if c_v is None else jnp.repeat(c_v, K, axis=0)

        out: Dict[str, jax.Array] = {}
        z_flat = None
        z_dec = None
        if not self.no_encoder:
            q_mean, q_std = self.encoder(images_fv, enc_captions, lengths,
                                         c_emb=c_emb, c_v=c_v)
            if self.use_fused_z and not self.is_initializing():
                # sampling + z_proj in one Pallas kernel: the [B·K,
                # K_z·L] samples never reach HBM (ops/fused_z.py; the
                # init pass takes the plain branch so z_proj params are
                # created either way)
                z_dec = self.decoder.sample_z_embedding_fused(
                    self.make_rng("z"), q_mean, q_std, self.gen_z_samples)
            else:
                # z is stored in compute dtype: its only consumer is the
                # z_proj matmul, which casts to compute dtype regardless —
                # identical values downstream, half the [B·K, K_z·L] HBM
                # traffic (77 MB f32 at reference train shapes)
                z = dist.sample_gaussian(self.make_rng("z"), q_mean, q_std,
                                         self.gen_z_samples,
                                         dtype=self.compute_dtype)  # [B*K, K_z, L]
                z_flat = z.reshape(z.shape[0], -1)
            out["q_mean"], out["q_std"] = q_mean, q_std

        carry = self.decoder.init_state(images_fv, c_emb, z_flat,
                                        deterministic, z_dec=z_dec)
        seq_out = self.decoder.teacher_forcing(
            carry, dec_captions, lengths, deterministic,
            return_hidden=return_hidden, time_major=time_major)
        out["hidden" if return_hidden else "logits"] = seq_out
        if c_v is not None:
            out["c_v"] = c_v
        return out

    # ------------------------------------------------------------------
    def decode_init(
        self,
        features: jax.Array,               # [B, 4096]
        c_v: Optional[jax.Array] = None,   # [B, 90]
    ) -> Carry:
        """Generation-time initial LSTM state (ref decoder.py:41-114,
        gen_mode): z ~ N(z_mean, decode_std) with z_mean = 0, except the
        AG prior which centers on the image's active cluster means.

        The K_z z-samples are drawn directly in the projected space
        (Decoder.gen_z_embedding): exact same distribution, 12,000×
        less noise generation."""
        B = features.shape[0]
        images_fv, c_emb = self._embed_conditioning(features, c_v)
        z_dec = None
        if not self.no_encoder:
            z_mean = jnp.zeros((B, self.latent_size), jnp.float32)
            if self.prior == "AG" and c_v is not None:
                z_mean = dist.ag_prior_mean(c_v, self.cluster_means)
            z_dec = self.decoder.gen_z_embedding(
                self.make_rng("z"), z_mean, self.decode_std,
                self.gen_z_samples)
        return self.decoder.init_state(images_fv, c_emb,
                                       deterministic=True, z_dec=z_dec)

    def decode_step(self, carry: Carry,
                    tokens: jax.Array) -> Tuple[Carry, jax.Array]:
        """tokens [B] → (carry, logits [B, V])."""
        return self.decoder.step(carry, tokens)

    def decode_step_hidden(self, carry: Carry,
                           tokens: jax.Array) -> Tuple[Carry, jax.Array]:
        """tokens [B] → (carry, hidden [B, H]); see Decoder.step_hidden."""
        return self.decoder.step_hidden(carry, tokens)


def logits_head_params(params) -> Tuple[jax.Array, jax.Array]:
    """(kernel, bias) of the decoder's rnn_logits head, for the fused
    kernels — single source of truth for the params-tree layout
    (CVAEModel: params['decoder'], FineTuneModel: params['cvae'][...])."""
    sub = params["cvae"] if "cvae" in params else params
    head = sub["decoder"]["rnn_logits"]
    return head["kernel"], head["bias"]


def decoder_step_params(params) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(embedding, lstm kernel, lstm bias) of the decoder's single-layer
    cell, for the fused LSTM decode-step kernel (ops/fused_lstm_step.py).
    Same tree-layout contract as logits_head_params."""
    sub = params["cvae"] if "cvae" in params else params
    dec = sub["decoder"]
    cell = dec["lstm"]["cell_0"]
    return (dec["dec_embeddings"]["embedding"], cell["kernel"],
            cell["bias"])


# ----------------------------------------------------------------------
# loss assembly (ref main.py:118-177)
# ----------------------------------------------------------------------

def compute_loss(
    outputs: Dict[str, jax.Array],
    labels: jax.Array,            # [B*K, T], 0 = PAD
    *,
    prior: str,
    no_encoder: bool,
    cluster_means: Optional[jax.Array] = None,
    cluster_sigma: float = 0.1,
    annealing: jax.Array | float = 1.0,
    logits_params: Optional[Tuple[jax.Array, jax.Array]] = None,
    gmm_true_kl: bool = False,
    ag_kl_sum: bool = False,
    time_major: bool = False,
    ce_kernel: str = "hybrid",
) -> Dict[str, jax.Array]:
    """Masked CE + prior KL + annealing → lower bound.

    rec: sparse softmax CE over all positions, PAD masked via label sign,
    mean over real tokens (main.py:152-158).  total = rec + ann·kld/10 —
    the reference's fixed /10 KL weight (main.py:172-174).

    ``time_major=True``: the model forward ran with ``time_major=True``
    and ``labels`` is [T, B·K] (caller transposes — an s32 [B·K, T]
    relayout is ~100 KB vs the 63-126 MB activation relayouts it
    avoids).  The CE math is positionwise so only the KL row mask needs
    the axis flip.

    When the model forward produced ``hidden`` instead of ``logits``
    (return_hidden=True), pass the rnn_logits (kernel, bias) via
    ``logits_params`` and the CE runs through a fused Pallas kernel
    pair selected by ``ce_kernel`` (ops/fused_ce.py): "flash" — [N, V]
    logits never reach HBM (memory lever); "hybrid" — bf16 logits
    written once, all other full-[N, V] passes fused (the fast path at
    reference shapes).
    """
    if "hidden" in outputs:
        from vae_captioning_tpu.ops.fused_ce import (fused_linear_ce,
                                                     fused_linear_ce_hybrid,
                                                     fused_linear_ce_xla_bwd)
        from vae_captioning_tpu.parallel.kernel_shard import linear_ce
        ce_fn = {"flash": fused_linear_ce,
                 "hybrid": fused_linear_ce_hybrid,
                 "xla_bwd": fused_linear_ce_xla_bwd}[ce_kernel]
        w, b = logits_params
        # flattening + PAD-mask weights happen inside linear_ce so a
        # >1-device mesh can shard rows BEFORE the time/batch dims mix
        # (parallel/kernel_shard.py; psums the mean's normalizer + sum)
        rec_loss = linear_ce(ce_fn, outputs["hidden"], w, b, labels,
                             batch_axis=1 if time_major else 0)
    else:
        # CE with f32 accumulation over compute-dtype (bf16) logits.
        # Same math as optax.softmax_cross_entropy_with_integer_labels
        # on logits.astype(f32) — the values are already bf16-rounded by
        # the head, so the upcast adds no precision — but the converts
        # are inside single-consumer elementwise chains, so XLA fuses
        # them into the reductions instead of materializing an f32
        # [B·K, T, V] copy of the step's largest tensor (round-3 trace:
        # that copy cost ~1.7 ms/step of pure HBM writes).
        #
        # The label logit is an iota==label masked reduction, NOT
        # take_along_axis: all three V-reductions then fuse into one
        # HBM pass, and the backward is elementwise (softmax − onehot)
        # instead of a scatter.  The gather variant measured +12 ms on
        # a 28 ms step (XLA serializes per-row gathers through scalar
        # memory — same pathology as the round-2 beam bookkeeping).
        logits = outputs["logits"]
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        sumexp = jnp.sum(jnp.exp((logits - m).astype(jnp.float32)), axis=-1)
        lse = jnp.log(sumexp) + m[..., 0].astype(jnp.float32)
        onehot = (labels[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (1,) * labels.ndim + (logits.shape[-1],),
            labels.ndim))
        label_logit = jnp.sum(
            jnp.where(onehot, logits, 0).astype(jnp.float32), axis=-1)
        ce = lse - label_logit
        mask = (labels != 0).astype(jnp.float32)
        rec_loss = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    # rows that are entirely padding (mesh-padded batches, images with
    # fewer than K captions) must not contribute to the KL mean either
    row_mask = jnp.any(labels != 0, axis=0 if time_major else -1)

    if no_encoder:
        kld = jnp.asarray(0.0, jnp.float32)
    elif prior == "AG":
        # ag_kl_sum restores the reference's implicit batch-sum weighting
        # of the AG KL (Config.ag_kl_sum; A/B in PERF.md)
        kld = dist.kl_ag(outputs["q_mean"], outputs["q_std"],
                         outputs["c_v"], cluster_means, cluster_sigma,
                         row_mask=row_mask,
                         reduce="sum" if ag_kl_sum else "mean")
    elif prior == "GMM" and gmm_true_kl:
        # opt-in true mixture KL (Config.gmm_true_kl); the default GMM
        # branch below keeps the reference's placeholder for parity
        kld = dist.kl_gmm(outputs["q_mean"], outputs["q_std"],
                          outputs["c_v"], cluster_means, cluster_sigma,
                          row_mask=row_mask)
    else:  # Normal; GMM uses the same formula (ref TODO, main.py:125-135)
        kld = dist.kl_standard_normal(outputs["q_mean"], outputs["q_std"],
                                      row_mask=row_mask)

    annealing = jnp.asarray(annealing, jnp.float32)
    lower_bound = rec_loss + annealing * kld / 10.0
    return {"loss": lower_bound, "rec_loss": rec_loss, "kld": kld,
            "annealing": annealing}
