"""GSPMD partitioning for the train-path Pallas kernels (VERDICT r3 #2).

A ``pallas_call`` has no SPMD partitioning rule: under ``pjit`` on a
multi-device mesh, XLA would all-gather its dp-sharded operands onto
every chip (or OOM at full per-chip batch) before running the kernel
replicated.  All three train-path kernels are row-independent over the
batch, so the fix is mechanical (NEXT r3 item 6): wrap each call in
``jax.shard_map`` over the dp axis so every chip runs the kernel on its
own rows, with the weights replicated.  The CE kernel's scalar is a
weighted SUM over rows, so its wrapper psums the partial sums (and the
global mask total that normalizes the weights).

The active mesh is process-global state set by the ``Trainer`` (and the
driver's ``dryrun_multichip``) before the step is traced —
``shard_map`` needs the concrete mesh at trace time, and threading it
through every Flax module attribute would push a host-side object into
model pytrees.  With no mesh set, or a 1-device mesh, every wrapper is
a zero-cost passthrough, so single-chip benches are byte-identical.

Randomness note: ``fused_z`` draws its noise from the on-chip PRNG
seeded per kernel invocation.  Under shard_map each shard folds its
``axis_index`` into the seed — otherwise all shards would draw the SAME
noise block for different rows.  Like the kernel itself vs the XLA
path (ops/fused_z.py docstring), this is the same N(mu, sigma^2) law on
a different stream, so a sharded fused-z train step matches the
single-device one in distribution, not bit-for-bit.  The deterministic
kernels (LSTM sequence, CE) ARE bit-comparable across mesh sizes (CE up
to f32 psum reassociation); tests/test_kernel_shard.py pins both
properties on the 8-virtual-device CPU mesh in interpret mode.

``check_vma=False`` on every shard_map: pallas_call has no varying-axis
rule, so the rep checker cannot type these bodies; the conservative
no-rewrite mode psums cotangents of replicated (unmentioned-axis)
inputs, which is exactly the dW/db gradient reduction dp training
needs — validated against single-device jax.grad in the tests.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_STATE: dict = {"mesh": None, "axis": "dp"}


def set_dp_mesh(mesh: Optional[Mesh], axis_name: str = "dp") -> None:
    """Register the data-parallel mesh the train-path kernels shard over.
    Pass ``None`` to clear.  Process-global; the last setter wins (one
    live Trainer per process is the supported configuration)."""
    _STATE["mesh"] = mesh
    _STATE["axis"] = axis_name


def get_dp_mesh() -> Optional[Tuple[Mesh, str]]:
    mesh = _STATE["mesh"]
    return None if mesh is None else (mesh, _STATE["axis"])


@contextlib.contextmanager
def dp_mesh(mesh: Optional[Mesh], axis_name: str = "dp"):
    prev = (_STATE["mesh"], _STATE["axis"])
    set_dp_mesh(mesh, axis_name)
    try:
        yield
    finally:
        set_dp_mesh(*prev)


def _active(batch_dim: Optional[int] = None) -> Optional[Tuple[Mesh, str]]:
    """The mesh to shard over, or None when wrapping would be a no-op.

    ``batch_dim``: the size of the dim that would be sharded; a size the
    mesh does not divide evenly (e.g. the 2-row dummy batch Flax init
    runs, or a caller that skipped ``mesh.pad_to_multiple``) falls back
    to the unsharded kernel — correct, just unpartitioned."""
    mesh = _STATE["mesh"]
    if mesh is None or np.prod(mesh.devices.shape) <= 1:
        return None
    if batch_dim is not None and batch_dim % np.prod(mesh.devices.shape):
        return None
    return mesh, _STATE["axis"]


def kernel_path(name: str) -> str:
    """'sharded' / 'single' — which path a kernel wrapper takes right
    now; surfaced by the multichip dryrun so the driver artifact records
    whether the fused kernels ran partitioned (VERDICT r3 #8)."""
    return "sharded" if _active() else "single"


# ----------------------------------------------------------------------
# fused teacher-forcing LSTM layer (ops/fused_lstm_seq.py)
# ----------------------------------------------------------------------

def lstm_seq(x: jax.Array, wx: jax.Array, wh: jax.Array, b: jax.Array,
             c0: jax.Array, h0: jax.Array, mask: jax.Array):
    """dp-sharded ``fused_lstm_seq``: rows (batch) split over the mesh,
    weights replicated.  Row-independent, so sharded == single-device
    bit-for-bit.  x: [T, B, E]; c0/h0: [B, H]; mask: [B, T]."""
    from vae_captioning_tpu.ops.fused_lstm_seq import fused_lstm_seq

    ctx = _active(batch_dim=c0.shape[0])
    if ctx is None:
        return fused_lstm_seq(x, wx, wh, b, c0, h0, mask)
    mesh, ax = ctx
    f = jax.shard_map(
        fused_lstm_seq, mesh=mesh,
        in_specs=(P(None, ax, None), P(), P(), P(), P(ax), P(ax), P(ax)),
        out_specs=((P(ax), P(ax)), P(None, ax, None)),
        check_vma=False)
    return f(x, wx, wh, b, c0, h0, mask)


# ----------------------------------------------------------------------
# fused z-sample + projection (ops/fused_z.py)
# ----------------------------------------------------------------------

def sample_project(seed: jax.Array, mean: jax.Array, std: jax.Array,
                   w: jax.Array, b: jax.Array, n_samples: int) -> jax.Array:
    """dp-sharded ``fused_sample_project``: each shard draws its own
    rows' noise from a shard-distinct stream (axis_index folded into the
    seed — see module docstring) and runs the sample+project kernel on
    its local [B/n, L] block."""
    from vae_captioning_tpu.ops.fused_z import fused_sample_project

    ctx = _active(batch_dim=mean.shape[0])
    if ctx is None:
        return fused_sample_project(seed, mean, std, w, b, n_samples)
    mesh, ax = ctx

    def body(seed, mean, std, w, b):
        idx = jax.lax.axis_index(ax).astype(jnp.int32)
        # golden-ratio odd-constant mix (int32 wraparound intended):
        # distinct shards -> distinct PRNG streams for the same base seed
        mix = (idx + 1) * jnp.int32(-1640531527)  # 0x9E3779B9 as signed
        return fused_sample_project(seed.at[0].set(seed[0] ^ mix),
                                    mean, std, w, b, n_samples)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(ax), P(ax), P(), P()),
        out_specs=P(ax),
        check_vma=False)
    return f(seed, mean, std, w, b)


# ----------------------------------------------------------------------
# fused AG recognition heads (ops/fused_ag_heads.py)
# ----------------------------------------------------------------------

def ag_heads(h: jax.Array, w: jax.Array, b: jax.Array, c_v: jax.Array):
    """dp-sharded ``fused_ag_heads``: rows split, the q_heads weights
    replicated.  Row-independent forward (sharded == single per row up
    to the same kernel rounding); the replicated w/b cotangents are
    psummed by the shard_map transpose exactly as for lstm_seq."""
    from vae_captioning_tpu.ops.fused_ag_heads import fused_ag_heads

    ctx = _active(batch_dim=h.shape[0])
    if ctx is None:
        return fused_ag_heads(h, w, b, c_v)
    mesh, ax = ctx
    f = jax.shard_map(
        fused_ag_heads, mesh=mesh,
        in_specs=(P(ax), P(), P(), P(ax)),
        out_specs=(P(ax), P(ax)),
        check_vma=False)
    return f(h, w, b, c_v)


# ----------------------------------------------------------------------
# decode-path kernels (ops/fused_lstm_step.py, ops/fused_logits_topk.py)
#
# Same hole as the train path, serving-side: a multi-chip batch decode
# under pjit would all-gather the lane-sharded carry into every chip at
# each pallas_call.  All four kernels are row(lane)-independent — top-K,
# lse and the sampled token are PER ROW — so dp sharding needs no
# collectives at all.  Lane counts are B·beam with B mesh-padded by the
# callers (inference.py pads features to the mesh multiple), so the
# divisibility fallback in _active() only triggers for ad-hoc shapes.
# ----------------------------------------------------------------------

def lstm_step(tokens: jax.Array, c: jax.Array, h: jax.Array,
              embed: jax.Array, w: jax.Array, b: jax.Array):
    """dp-sharded decode LSTM step: lanes split, embed/weights
    replicated.  Bit-identical to the unsharded kernel per lane."""
    from vae_captioning_tpu.ops.fused_lstm_step import fused_lstm_step

    ctx = _active(batch_dim=c.shape[0])
    if ctx is None:
        return fused_lstm_step(tokens, c, h, embed, w, b)
    mesh, ax = ctx
    f = jax.shard_map(
        fused_lstm_step, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(), P(), P()),
        out_specs=(P(ax), P(ax)),
        check_vma=False)
    return f(tokens, c, h, embed, w, b)


def logits_top_k(h: jax.Array, w: jax.Array, b: jax.Array, k: int):
    """dp-sharded fused logits+top-K+lse (per-row outputs, no psum)."""
    from vae_captioning_tpu.ops.fused_logits_topk import fused_logits_top_k

    ctx = _active(batch_dim=h.shape[0])
    if ctx is None:
        return fused_logits_top_k(h, w, b, k)
    mesh, ax = ctx
    f = jax.shard_map(
        lambda h, w, b: fused_logits_top_k(h, w, b, k), mesh=mesh,
        in_specs=(P(ax), P(), P()),
        out_specs=(P(ax), P(ax), P(ax)),
        check_vma=False)
    return f(h, w, b)


def logits_top_k_int8(h: jax.Array, wq: jax.Array, ws: jax.Array,
                      b: jax.Array, k: int):
    """dp-sharded int8 variant (Config.decode_int8)."""
    from vae_captioning_tpu.ops.fused_logits_topk import (
        fused_logits_top_k_int8)

    ctx = _active(batch_dim=h.shape[0])
    if ctx is None:
        return fused_logits_top_k_int8(h, wq, ws, b, k)
    mesh, ax = ctx
    f = jax.shard_map(
        lambda h, wq, ws, b: fused_logits_top_k_int8(h, wq, ws, b, k),
        mesh=mesh,
        in_specs=(P(ax), P(), P(), P()),
        out_specs=(P(ax), P(ax), P(ax)),
        check_vma=False)
    return f(h, wq, ws, b)


def topk_lse(x: jax.Array, k: int):
    """dp-sharded standalone top-K+logsumexp over materialized logits
    (ops/topk_pallas.py — the non-fused-step beam path)."""
    from vae_captioning_tpu.ops.topk_pallas import top_k_logsumexp_pallas

    ctx = _active(batch_dim=x.shape[0])
    if ctx is None:
        return top_k_logsumexp_pallas(x, k)
    mesh, ax = ctx
    f = jax.shard_map(
        lambda x: top_k_logsumexp_pallas(x, k), mesh=mesh,
        in_specs=(P(ax, None),),
        out_specs=(P(ax), P(ax), P(ax)),
        check_vma=False)
    return f(x)


def logits_sample(h: jax.Array, w: jax.Array, b: jax.Array,
                  seed: jax.Array, temperature: float):
    """dp-sharded fused Gumbel-max sampling.  Each shard folds its
    ``axis_index`` into the seed (same golden-ratio mix as fused_z) so
    lanes on different shards draw from distinct streams — without it,
    the kernel's per-local-row noise would REPEAT across shards.  Same
    per-row categorical law as the unsharded kernel, different stream
    (the fused sampler is already stream-distinct from the XLA path,
    ops/fused_logits_topk.py)."""
    from vae_captioning_tpu.ops.fused_logits_topk import fused_logits_sample

    ctx = _active(batch_dim=h.shape[0])
    if ctx is None:
        return fused_logits_sample(h, w, b, seed, temperature)
    mesh, ax = ctx

    def body(h, w, b, seed):
        idx = jax.lax.axis_index(ax).astype(jnp.int32)
        mix = (idx + 1) * jnp.int32(-1640531527)  # 0x9E3779B9 as signed
        return fused_logits_sample(h, w, b, seed ^ mix, temperature)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(ax), P(), P(), P()),
        out_specs=P(ax),
        check_vma=False)
    return f(h, w, b, seed)


# ----------------------------------------------------------------------
# fused linear + cross-entropy (ops/fused_ce.py)
# ----------------------------------------------------------------------

def linear_ce(ce_fn: Callable, hidden: jax.Array, w: jax.Array,
              b: jax.Array, labels: jax.Array, *,
              batch_axis: int) -> jax.Array:
    """PAD-masked mean CE through a fused kernel, dp-sharded.

    ``hidden``: [..., H] with the batch (B*K) dim at ``batch_axis``
    (1 when time-major [T, B*K, H], 0 otherwise); ``labels`` has the
    matching layout minus the H dim.  Flattening happens INSIDE the
    shard body: the row order of ``hidden.reshape(-1, H)`` interleaves
    time and batch, so flattening before shard_map would need an
    all-to-all to reach contiguous row shards — per-shard local reshape
    is free.  The mean's normalizer (global real-token count) and the
    weighted-sum result are psummed across shards.
    """
    H = hidden.shape[-1]

    def local_ce(hid, w, b, lab, axis_name: Optional[str]):
        lab_flat = lab.reshape(-1)
        mask = (lab_flat != 0).astype(jnp.float32)
        total = jnp.sum(mask)
        if axis_name is not None:
            total = jax.lax.psum(total, axis_name)
        weights = mask / jnp.maximum(total, 1.0)
        loss = ce_fn(hid.reshape(-1, H), w, b, lab_flat, weights)
        if axis_name is not None:
            loss = jax.lax.psum(loss, axis_name)
        return loss

    ctx = _active(batch_dim=hidden.shape[batch_axis])
    if ctx is None:
        return local_ce(hidden, w, b, labels, None)
    mesh, ax = ctx

    def spec_for(ndim: int) -> P:
        parts: list = [None] * ndim
        parts[batch_axis] = ax
        return P(*parts)

    f = jax.shard_map(
        lambda hid, w, b, lab: local_ce(hid, w, b, lab, ax),
        mesh=mesh,
        in_specs=(spec_for(hidden.ndim), P(), P(), spec_for(labels.ndim)),
        out_specs=P(),
        check_vma=False)
    return f(hidden, w, b, labels)
