"""Orbax checkpointing.

Replaces ``tf.train.Saver`` (``main.py:186-191,286-290``): one PyTree
(params + opt_state + step) saved per epoch with ``max_to_keep``
retention, plus JSON sidecars for the config and vocabulary — the
reference's pickled ``Parameters`` / vocab pickle / cluster-means pickle
(cluster means are seed-deterministic here, no sidecar needed).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from vae_captioning_tpu.config import Config


# ----------------------------------------------------------------------
# Pre-round-4 checkpoint compatibility: the encoder's posterior heads
# were two dense layers (``lz_mean`` / ``lz_logstd``); round 4 fused
# them into ONE ``q_heads`` dense whose kernel/bias are the two halves
# concatenated MEAN-FIRST along the last axis (models/encoder.py:55,
# ref vae_model/encoder.py:60-66).  Checkpoints written before the
# rename no longer match the live param tree — ``restore`` migrates
# them in place (VERDICT r4 #7; the reference keeps whole-Saver compat
# by construction, main.py:186-191).

def _walk_dicts(node: Any, fn: Callable[[dict], dict]) -> Any:
    """Apply ``fn`` bottom-up to every dict node of a PyTree, preserving
    container types (dicts, lists, tuples/namedtuples — optax states —
    and flax.struct dataclasses like TrainState)."""
    if isinstance(node, dict):
        return fn({k: _walk_dicts(v, fn) for k, v in node.items()})
    if isinstance(node, tuple):
        mapped = [_walk_dicts(v, fn) for v in node]
        if hasattr(node, "_fields"):          # namedtuple (optax states)
            return type(node)(*mapped)
        return tuple(mapped)
    if isinstance(node, list):
        return [_walk_dicts(v, fn) for v in node]
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        return type(node)(**{
            f.name: _walk_dicts(getattr(node, f.name), fn)
            for f in dataclasses.fields(node)})
    return node


def _half(leaf: Any, which: int) -> Any:
    """Half of a concatenated leaf along the last axis: slices real
    arrays, reconstructs ShapeDtypeStructs (abstract trees)."""
    h = leaf.shape[-1] // 2
    if isinstance(leaf, jax.ShapeDtypeStruct):
        return jax.ShapeDtypeStruct(leaf.shape[:-1] + (h,), leaf.dtype)
    return leaf[..., :h] if which == 0 else leaf[..., h:]


def split_q_heads(tree: Any) -> tuple[Any, int]:
    """New-layout tree -> pre-rename layout (q_heads -> lz_mean +
    lz_logstd).  Applies everywhere the pattern occurs — the optimizer
    moments mirror the param tree, so Adam's mu/nu migrate too.
    Returns (tree, number of nodes rewritten)."""
    n = [0]

    def fix(node: dict) -> dict:
        qh = node.get("q_heads")
        if isinstance(qh, dict) and qh:
            n[0] += 1
            out = {k: v for k, v in node.items() if k != "q_heads"}
            out["lz_mean"] = {k: _half(v, 0) for k, v in qh.items()}
            out["lz_logstd"] = {k: _half(v, 1) for k, v in qh.items()}
            return out
        return node

    return _walk_dicts(tree, fix), n[0]


def merge_q_heads(tree: Any) -> tuple[Any, int]:
    """Pre-rename layout -> new layout (lz_mean ++ lz_logstd ->
    q_heads, mean-first).  Returns (tree, number of nodes rewritten)."""
    n = [0]

    def fix(node: dict) -> dict:
        m, s = node.get("lz_mean"), node.get("lz_logstd")
        if isinstance(m, dict) and isinstance(s, dict) and set(m) == set(s):
            n[0] += 1
            out = {k: v for k, v in node.items()
                   if k not in ("lz_mean", "lz_logstd")}
            out["q_heads"] = {
                k: jnp.concatenate([m[k], s[k]], axis=-1) for k in m}
            return out
        return node

    return _walk_dicts(tree, fix), n[0]


class Checkpointer:
    def __init__(self, directory: str, name: str = "last_run",
                 max_to_keep: int = 5):
        self.directory = os.path.abspath(os.path.join(directory, name))
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    # ------------------------------------------------------------------
    def save(self, state: Any, step: Optional[int] = None) -> None:
        """Async save: returns once the state is snapshotted; the write
        completes in the background (SURVEY §5 rebuild: 'per-N-step Orbax
        checkpointing with async save').  A still-running previous save
        is drained first."""
        self._mgr.wait_until_finished()
        step = int(state.step) if step is None else int(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def restore(self, abstract_state: Any,
                step: Optional[int] = None) -> Any:
        self._mgr.wait_until_finished()
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}")
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state))
        except Exception as e:
            # Pre-q_heads-rename checkpoint?  Retry against the OLD
            # layout and migrate (see split_q_heads/merge_q_heads above).
            old_abstract, n_split = split_q_heads(abstract_state)
            if n_split == 0:
                raise
            try:
                old_state = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(old_abstract))
            except Exception:
                raise RuntimeError(
                    f"checkpoint at {self.directory} step {step} matches "
                    f"neither the current param layout (fused q_heads) "
                    f"nor the pre-rename layout (lz_mean/lz_logstd); "
                    f"original error: {e}") from e
            migrated, n_merged = merge_q_heads(old_state)
            assert n_merged == n_split
            print(f"[checkpoint] migrated pre-rename layout: "
                  f"{n_merged} lz_mean/lz_logstd node(s) -> q_heads")
            return migrated

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def all_steps(self) -> list:
        self._mgr.wait_until_finished()
        return sorted(self._mgr.all_steps())

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_sidecars(cfg: Config, vocab, directory: str,
                  name: str = "last_run") -> None:
    base = os.path.join(directory, name)
    os.makedirs(base, exist_ok=True)
    cfg.save(os.path.join(base, "config.json"))
    vocab.save(os.path.join(base, "vocab.json"))


def load_sidecars(directory: str, name: str = "last_run"):
    from vae_captioning_tpu.data.vocabulary import Vocabulary

    base = os.path.join(directory, name)
    cfg = Config.load(os.path.join(base, "config.json"))
    vocab = Vocabulary.load(os.path.join(base, "vocab.json"))
    return cfg, vocab
