"""Orbax checkpointing.

Replaces ``tf.train.Saver`` (``main.py:186-191,286-290``): one PyTree
(params + opt_state + step) saved per epoch with ``max_to_keep``
retention, plus JSON sidecars for the config and vocabulary — the
reference's pickled ``Parameters`` / vocab pickle / cluster-means pickle
(cluster means are seed-deterministic here, no sidecar needed).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from vae_captioning_tpu.config import Config


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
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(abstract_state))

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
