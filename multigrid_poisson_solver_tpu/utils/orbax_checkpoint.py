"""Orbax backend for solver checkpointing.

The plain ``.npz`` backend (utils.checkpoint) is dependency-free and fine for
single-host runs; this module layers the same ``SolverState`` contract on
``orbax.checkpoint`` for the capabilities the npz path cannot offer:

  * ASYNC saves — the train/solve loop does not block on serialization
    (Orbax AsyncCheckpointer snapshots device arrays then writes in a
    background thread);
  * SHARDED arrays — a GSPMD row/block-partitioned state saves without
    gathering to one host, and restores with its sharding, the multi-host
    requirement of SURVEY.md §5's checkpoint/resume row;
  * the standard production checkpoint layout (step directories + atomic
    finalization), interoperable with the wider JAX ecosystem.

Drop-in: ``OrbaxCheckpointManager`` exposes the exact ``maybe_save`` /
``latest`` surface of ``utils.checkpoint.CheckpointManager``, so
``IterativeRefinementSolver.solve(checkpoints=...)`` accepts either.

The reference has no persistence at all (SURVEY.md §5; its warm restart is
the in-memory init flag, linkedlist.h:38-41).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from .checkpoint import SolverState


def _handlers():
    import orbax.checkpoint as ocp

    return ocp


class OrbaxCheckpointManager:
    """SolverState persistence via orbax.checkpoint.CheckpointManager.

    Same contract as utils.checkpoint.CheckpointManager: ``maybe_save(state)``
    on a cycle cadence with rotation, ``latest() -> SolverState | None``.
    ``async_save=True`` (default) returns from ``maybe_save`` as soon as the
    device arrays are snapshotted.
    """

    def __init__(self, directory: str | os.PathLike, every: int = 1,
                 keep: int = 3, async_save: bool = True):
        ocp = _handlers()
        self.dir = Path(directory).absolute()
        self.every = max(1, every)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max(1, keep),
            enable_async_checkpointing=async_save)
        self._mgr = ocp.CheckpointManager(self.dir, options=options)

    def maybe_save(self, state: SolverState) -> bool:
        if state.cycle % self.every != 0:
            return False
        ocp = _handlers()
        tree = {"u": state.u, "f": state.f}
        if state.u_lo is not None:
            tree["u_lo"] = state.u_lo
        if state.u_lo2 is not None:
            tree["u_lo2"] = state.u_lo2
        meta = dict(state.meta or {})
        meta["cycle"] = int(state.cycle)
        self._mgr.save(int(state.cycle), args=ocp.args.Composite(
            arrays=ocp.args.StandardSave(tree),
            meta=ocp.args.JsonSave(meta)))
        return True

    def latest(self) -> Optional[SolverState]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        ocp = _handlers()
        restored = self._mgr.restore(step, args=ocp.args.Composite(
            arrays=ocp.args.StandardRestore(),
            meta=ocp.args.JsonRestore()))
        tree, meta = restored["arrays"], dict(restored["meta"])
        return SolverState(
            u=np.asarray(tree["u"]), f=np.asarray(tree["f"]),
            u_lo=(np.asarray(tree["u_lo"]) if "u_lo" in tree else None),
            u_lo2=(np.asarray(tree["u_lo2"]) if "u_lo2" in tree else None),
            cycle=meta.pop("cycle", step), meta=meta)

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
