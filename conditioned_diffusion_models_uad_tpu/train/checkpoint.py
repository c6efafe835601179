"""Orbax checkpointing with the reference's best/last-per-fold semantics.

Capability parity with the reference's checkpoint stack
(reference: configs/callbacks/checkpoint.yaml:1-9 — monitor val loss,
save_top_k 1, save_last; per-fold suffixing src/train.py:102-118; best/last
resolution utils.get_checkpoint, src/utils/utils.py:188-231; cross-model
encoder surgery DDPM_2D.py:79-96 is `models.tasks.import_spark_encoder`).

Layout on disk:

    <ckpt_dir>/fold-<k>/best/      orbax pytree (the lowest-val-loss VARIABLES:
                                   params + batch_stats + step — no optimizer
                                   state; 'best' exists to be evaluated or
                                   fine-tuned, and the Adam moments are ~2/3
                                   of the full payload on a 15 MB/s tunneled
                                   D2H link)
    <ckpt_dir>/fold-<k>/last/      orbax pytree (the most recent FULL state —
                                   resume needs the optimizer moments)
    <ckpt_dir>/fold-<k>/meta.json  {'best': {'step':…, 'val_loss':…}, 'last': …}
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

# 'best' checkpoint payload: everything an eval/reload or encoder-surgery
# consumer reads (orchestrate._restore_variables, import_spark_encoder)
BEST_KEYS = ("params", "batch_stats", "step")


def variables_only(state: Any) -> Any:
    """The 'best'-checkpoint subset of a train state (see module docstring)."""
    if isinstance(state, dict):
        return {k: state[k] for k in BEST_KEYS if k in state}
    return state


class FoldCheckpointer:
    """best/last checkpoint pair for one fold."""

    def __init__(self, ckpt_dir: str, fold: int = 0):
        self.dir = os.path.abspath(os.path.join(ckpt_dir, f"fold-{fold}"))
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = os.path.join(self.dir, "meta.json")
        self.meta = {}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)

    def _save(self, name: str, state: Any, step: int, val_loss: Optional[float]):
        path = os.path.join(self.dir, name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        self.meta[name] = {"step": int(step), "val_loss": val_loss}
        with open(self._meta_path, "w") as f:
            json.dump(self.meta, f)

    def save_last(self, state: Any, step: int, val_loss: Optional[float] = None):
        self._save("last", state, step, val_loss)

    def maybe_save_best(self, state: Any, step: int, val_loss: float) -> bool:
        """Keep only the best-by-val-loss VARIABLES (save_top_k=1 semantics;
        optimizer state is stripped — resume restores 'last', VERDICT r4 #2).
        A non-finite val loss never becomes 'best' — a NaN written once would
        poison every later comparison (x < nan is always False) and pin the
        diverged state as the restored checkpoint for the whole run."""
        if not self.is_best(val_loss):
            return False
        self._save("best", variables_only(state), step, float(val_loss))
        return True

    def is_best(self, val_loss: Optional[float]) -> bool:
        """Would this val loss become the new 'best'? (The save decision,
        separated so an async writer can defer only the slow save.)"""
        import math

        if val_loss is None or not math.isfinite(val_loss):
            return False
        prev = self.meta.get("best", {}).get("val_loss", None)
        return prev is None or not math.isfinite(prev) or val_loss < prev

    def restore(self, which: str = "best", target: Any = None) -> Tuple[Any, dict]:
        """Restore 'best' (falling back to 'last', as the reference's
        get_checkpoint falls through) or 'last'. `target` is an abstract pytree
        for sharded/typed restoration; None restores as numpy."""
        name = which
        if name == "best" and "best" not in self.meta:
            name = "last"
        path = os.path.join(self.dir, name)
        if not os.path.exists(path):
            raise FileNotFoundError(f"no '{which}' checkpoint under {self.dir}")
        if target is not None:
            if name == "best":
                # 'best' stores variables only — restore just that subset of
                # a full-train-state target (opt_state lives in 'last')
                target = variables_only(target)
            state = self._ckptr.restore(path, target)
        else:
            state = self._ckptr.restore(path)
        return state, self.meta.get(name, {})

    def exists(self, which: str = "last") -> bool:
        return os.path.exists(os.path.join(self.dir, which))


def find_run_checkpoint(run_dir: str, which: str = "best", fold: int = 0) -> str:
    """Resolve a checkpoint directory inside a previous run directory
    (reference utils.get_checkpoint path walking, utils.py:188-231)."""
    cand = os.path.join(run_dir, "checkpoints", f"fold-{fold}", which)
    if os.path.exists(cand):
        return cand
    cand = os.path.join(run_dir, f"fold-{fold}", which)
    if os.path.exists(cand):
        return cand
    raise FileNotFoundError(f"no {which} checkpoint for fold {fold} in {run_dir}")
