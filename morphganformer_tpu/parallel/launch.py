"""Multi-host launch: single-controller JAX across processes.

Replaces the reference's per-GPU process spawn + torch.distributed NCCL
rendezvous (reference run_network.py:372-402) with the JAX multi-host
model: every host runs the SAME program, `jax.distributed.initialize`
wires the processes into one system, and `jax.devices()` then spans all
hosts — the data mesh (parallel/mesh.py) and the SPMD train step
(training/train_step.py) work unchanged, with gradient all-reduces over
ICI within a slice and DCN across slices.

The reference's `rank == 0` gating maps to `jax.process_index() == 0`
(used by training/loop.py for logging/snapshots).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           requested: bool = False) -> int:
    """Initialize multi-host JAX and return this process's index.

    `requested=True` (cli/train.py --multihost) forces the call even with no
    explicit coordinator/num_processes: on a Cloud TPU pod
    `jax.distributed.initialize()` auto-detects the rendezvous, and a bare
    `--multihost` silently training num_hosts independent single-host runs
    would be a correctness bug (ADVICE r2 high). Explicit arguments support
    manual rendezvous (reference run_network.py:372-379's file:// init
    becomes a coordinator address). Safe to call when already initialized
    or single-process (num_processes=1 without `requested`): both are
    no-ops beyond returning the process index.
    """
    already = jax.distributed.is_initialized()
    if not already and (requested or coordinator
                       or num_processes not in (None, 1)
                       or os.environ.get("MGT_MULTIHOST") == "1"):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index()


def is_main_process() -> bool:
    """The logging/snapshot gate (reference training_loop rank==0 checks)."""
    return jax.process_index() == 0
