"""Latent-variable math: reparameterized sampling, analytic KLs, cluster
means, and KL annealing.

The reference wraps these in zhusuan stochastic tensors
(``vae_model/encoder.py:108-110``, ``vae_model/decoder.py:72-74``) and
inline graph code (``main.py:118-177``); here they are ~80 lines of
explicit JAX, which is all a CVAE needs.

Numerical constants (the 1e-5 / 1e-7 epsilons, the /10 KL weight, the
tanh annealing ramp) match the reference exactly — CIDEr parity depends
on training dynamics, not just architecture.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# epsilons as in ref main.py:120-145
_EPS_LOG = 1e-5
_EPS_DIV = 1e-7


def sample_gaussian(key: jax.Array, mean: jax.Array, std: jax.Array,
                    num_samples: int, dtype=None) -> jax.Array:
    """Draw ``num_samples`` reparameterized z's.

    mean/std: [B, L] (std may be scalar) → returns [B, K, L], cast to
    ``dtype`` when given (the train path stores z in compute dtype — its
    only consumer is a matmul that casts anyway).

    The reference draws [K, B, L] and reshapes to [B, K*L] *sample-major*
    (``vae_model/decoder.py:108-113``), which interleaves different
    images' samples into one row — a bug that only cancels out at decode
    batch 1.  We keep each image's own K samples contiguous ([B, K, L] →
    flatten [B, K*L]); documented deviation, validated by CIDEr parity
    rather than bit parity (SURVEY §7 hard part 2).
    """
    B, L = mean.shape[0], mean.shape[-1]
    eps = jax.random.normal(key, (B, num_samples, L), dtype=mean.dtype)
    std = jnp.asarray(std, mean.dtype)
    if std.ndim == 2:  # per-dim [B, L] → broadcast over the sample axis
        std = std[:, None, :]
    z = mean[:, None, :] + std * eps
    return z if dtype is None else z.astype(dtype)


def kl_standard_normal(mean: jax.Array, std: jax.Array,
                       row_mask: jax.Array | None = None) -> jax.Array:
    """KL(q(z) || N(0, I)) — batch-mean scalar (ref main.py:120-124).

    Formula (Kingma & Welling):  -0.5 * mean_B sum_L (1 + log σ² − μ² − σ²).
    The reference adds 1e-5 inside the log; reproduced.  ``row_mask``
    excludes padding rows (mesh-padded batches) from the mean.
    """
    inner = (1.0 + jnp.log(jnp.square(std) + _EPS_LOG)
             - jnp.square(mean) - jnp.square(std))
    per_example = -0.5 * jnp.sum(inner, axis=-1)
    return _masked_mean(per_example, row_mask)


def _masked_mean(per_example: jax.Array,
                 row_mask: jax.Array | None) -> jax.Array:
    if row_mask is None:
        return jnp.mean(per_example)
    row_mask = row_mask.astype(per_example.dtype)
    return (jnp.sum(per_example * row_mask)
            / jnp.maximum(jnp.sum(row_mask), 1.0))


def kl_ag(mean: jax.Array, std: jax.Array, c_v: jax.Array,
          cluster_means: jax.Array, cluster_sigma: float = 0.1,
          row_mask: jax.Array | None = None,
          reduce: str = "mean") -> jax.Array:
    """Additive-Gaussian KLD (ref main.py:136-145).

    Per-dim:  0.5 + log σ_q − log σ_c − ((μ_q − c_v·μ_k)² + σ_q²)/(2 σ_c²)
    then  kld = −0.5 · Σ_dims, batch-reduced.

    The reference leaves this per-example ([B]) and lets tf.gradients
    implicitly *sum* it into the loss while Normal-prior KL is *meaned* —
    we mean both by default for a consistent, batch-size-independent KL
    weight (documented deviation).  ``reduce="sum"`` restores the
    reference's effective weighting (masked sum over valid rows — a
    batch-size-DEPENDENT KL weight, ~B× stronger regularization at the
    same annealing; ``Config.ag_kl_sum``); the A/B on the COCO-statistics
    corpus is in PERF.md.

    c_v: [B, 90] weights, cluster_means: [90, L].
    """
    prior_mean = c_v @ cluster_means  # [B, L]
    sig_c = jnp.asarray(cluster_sigma, mean.dtype)
    inner = (0.5 + jnp.log(std + _EPS_LOG) - jnp.log(sig_c + _EPS_LOG)
             - (jnp.square(mean - prior_mean) + jnp.square(std))
             / (2.0 * jnp.square(sig_c) + _EPS_DIV))
    per_example = -0.5 * jnp.sum(inner, axis=-1)
    if reduce == "sum":
        if row_mask is None:
            return jnp.sum(per_example)
        return jnp.sum(per_example * row_mask.astype(per_example.dtype))
    return _masked_mean(per_example, row_mask)


def kl_gmm(mean: jax.Array, std: jax.Array, c_v: jax.Array,
           cluster_means: jax.Array, cluster_sigma: float = 0.1,
           row_mask: jax.Array | None = None) -> jax.Array:
    """True GMM-prior KL — variational upper bound (``Config.gmm_true_kl``).

    The reference's GMM loss is an acknowledged placeholder: it applies
    the standard-normal KL to the GMM posterior (ref ``main.py:125-135``,
    "TODO").  This is the real thing:

        KL(q ‖ Σ_k w_k N(μ_k, σ_c² I))
            ≤ −log Σ_k w_k exp(−KL(q ‖ N(μ_k, σ_c² I)))

    the single-Gaussian variational bound of Hershey & Olsen (ICASSP
    2007, eq. 7/20).  It is tight (exact) when the mixture components
    are well separated and reduces *exactly* to the Gaussian–Gaussian
    KL when only one component has weight — both asserted in
    tests/test_ops.py.

    Mixture weights w_k come from the image's cluster vector (the same
    conditioning the reference's GMM prior uses); all-zero rows (no
    detections) fall back to uniform weights.

    c_v: [B, 90] nonnegative weights, cluster_means: [90, L].
    """
    Kc = cluster_means.shape[0]
    has_any = jnp.sum(c_v, axis=-1, keepdims=True) > 0
    w = jnp.where(has_any, c_v, jnp.ones_like(c_v) / Kc)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    sig_c = jnp.asarray(cluster_sigma, mean.dtype)
    var_c = jnp.square(sig_c) + _EPS_DIV
    # component-independent part of KL(q ‖ N(μ_k, σ_c² I)):
    #   Σ_dims [ log σ_c − log σ_q + σ_q²/(2σ_c²) − ½ ]           [B]
    base = jnp.sum(jnp.log(sig_c + _EPS_LOG) - jnp.log(std + _EPS_LOG)
                   + jnp.square(std) / (2.0 * var_c) - 0.5, axis=-1)
    # ‖μ_q − μ_k‖² via the expansion (one [B,L]·[L,K] matmul)   [B, K]
    d2 = (jnp.sum(jnp.square(mean), axis=-1, keepdims=True)
          - 2.0 * mean @ cluster_means.T
          + jnp.sum(jnp.square(cluster_means), axis=-1)[None, :])
    kl_k = base[:, None] + jnp.maximum(d2, 0.0) / (2.0 * var_c)
    per_example = -jax.nn.logsumexp(
        jnp.log(jnp.maximum(w, 1e-30)) - kl_k, axis=-1)
    return _masked_mean(per_example, row_mask)


def init_cluster_means(num_clusters: int, latent_size: int,
                       seed: int = 0) -> np.ndarray:
    """Unit-norm random cluster means [num_clusters, latent_size].

    The reference draws uniform [-1,1) rows normalized to unit L2 and
    pickles them so train and inference agree
    (``utils/vae_utils.py:6-31``); here they are a deterministic function
    of the seed — no pickle sidecar needed.
    """
    rng = np.random.default_rng(seed)
    m = 2.0 * rng.random((num_clusters, latent_size)) - 1.0
    m /= np.sqrt((m ** 2).sum(axis=1, keepdims=True))
    return m.astype(np.float32)


def kl_annealing(step: jax.Array, ann_param: float,
                 force_one: bool = False) -> jax.Array:
    """tanh annealing ramp (ref main.py:162-170).

    (tanh((step − 1000·ann_param)/1000) + 1)/2 when ann_param > 1, else
    constant 1.  ``force_one`` mirrors fine_tune/restore forcing 1.0.
    """
    if force_one or ann_param <= 1.0:
        return jnp.asarray(1.0, jnp.float32)
    return (jnp.tanh((step.astype(jnp.float32) - 1000.0 * ann_param)
                     / 1000.0) + 1.0) / 2.0


# unused COCO category ids within 0..90, in the *91-dim* id space
# (ref vae_model/decoder.py:56 — blacklist for the AG decode-time prior)
AG_UNUSED_CLASSES = (0, 12, 26, 29, 30, 45, 66, 68, 69, 71, 83)


def ag_prior_mean(c_v: jax.Array, cluster_means: jax.Array) -> jax.Array:
    """Decode-time AG prior mean, vectorized over the batch.

    The reference (``vae_model/decoder.py:45-71``) handles only one image
    (it reads ``c_i_ph[0]``): mean of the cluster means whose c_v entry is
    positive; if no detection fired, mean over all *used* classes (the
    91-id blacklist above, shifted by the dropped index 0 into the 90-dim
    c_v space).  Here it is fully batched.

    c_v: [B, 90] (index 0 already dropped), cluster_means: [90, L].
    """
    active = (c_v > 0).astype(cluster_means.dtype)            # [B, 90]
    used = np.ones((cluster_means.shape[0],), dtype=np.float32)
    for cls in AG_UNUSED_CLASSES:
        idx = cls - 1  # shift into the 90-dim space (c_v[:, 1:])
        if 0 <= idx < used.shape[0]:
            used[idx] = 0.0
    fallback = jnp.asarray(used, cluster_means.dtype)          # [90]
    has_any = jnp.sum(active, axis=-1, keepdims=True) > 0      # [B, 1]
    weights = jnp.where(has_any, active, fallback[None, :])
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights @ cluster_means                             # [B, L]
