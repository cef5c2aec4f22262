"""Orbax-backed async training snapshots.

The default snapshot format (checkpoint/io.py + training/loop.py) writes
arch.json + msgpack synchronously — simple, portable, fine for the
reference's snapshot cadence (one every ~200 kimg). For very large runs
the save stall matters: Orbax's AsyncCheckpointer serializes device
arrays to host in the background while training continues, matching the
snapshot-restart recovery model (SURVEY.md §5.3/§5.4) without pausing
the step loop.

Selected with LoopConfig.snapshot_backend="orbax"; the msgpack files
remain the interchange format (generate/project CLIs, the converter),
so the loop still writes arch.json + Gs.msgpack alongside for
compatibility — Orbax covers the big train_state tree (params, both
optimizers, EMA) where the stall actually is.
"""

from __future__ import annotations

import os
from typing import Any, Optional


class AsyncSnapshotter:
    """Background writer for train-state pytrees (one outstanding save)."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckpt = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, state: Any) -> None:
        """Start an async save of `state` to `path`/orbax (non-blocking;
        waits for any previous save first so at most one is in flight).
        Collective: on multi-host every process must call this."""
        import orbax.checkpoint as ocp

        self._ckpt.wait_until_finished()
        self._ckpt.save(os.path.abspath(os.path.join(path, "orbax")),
                        args=ocp.args.StandardSave(state), force=True)

    def wait(self) -> None:
        self._ckpt.wait_until_finished()

    def restore(self, path: str, template: Optional[Any] = None) -> Any:
        """Load a snapshot saved by `save` (blocking). With a `template`
        pytree the leaves come back with its exact dtypes/shardings."""
        import orbax.checkpoint as ocp

        self.wait()
        target = os.path.abspath(os.path.join(path, "orbax"))
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckpt:
            if template is not None:
                return ckpt.restore(
                    target, args=ocp.args.StandardRestore(template))
            return ckpt.restore(target)

    def close(self) -> None:
        self.wait()
        self._ckpt.close()
