"""Adaptive Posterior Learning (APL) — episodic kNN memory + relational
decoder (reference apl/, SURVEY.md §2.5). Unused by the morphing pipeline
in the reference too; ported for inventory completeness, redesigned as a
device-resident functional store so episodes run inside one jit/scan."""

from morphganformer_tpu.apl.memory import (MemoryState, add_entries, flush,
                                           init_memory, nearest_entries,
                                           num_entries)
from morphganformer_tpu.apl.models import (MHDPA, Encoder, NormMLP,
                                           ResidualTransform, RSAFFDecoder)

__all__ = [
    "MemoryState", "init_memory", "add_entries", "nearest_entries", "flush",
    "num_entries", "MHDPA", "NormMLP", "ResidualTransform", "RSAFFDecoder",
    "Encoder",
]
