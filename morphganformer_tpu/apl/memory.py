"""Episodic memory store for Adaptive Posterior Learning (APL).

Behavioral spec: reference apl/memory_store.py — a fixed-size ring buffer of
(embedding, label) pairs with kNN retrieval by squared-L2 distance
(MemoryStore.add_entry :25-36, add_batched_entries :38-63,
get_nearest_entries :65-89, flush :91-97).

TPU-native redesign: the reference store is a host-side Python object
mutated imperatively once per step, which forces a device round-trip per
episode step. Here the store is an immutable pytree of device arrays with
pure update/query functions, so an entire episode (write + retrieve every
step) stays inside one ``jax.jit`` / ``lax.scan`` — no host sync, static
shapes throughout.

Semantics notes vs the reference:
- The ring-buffer write is a single modular scatter
  (``(pointer + arange(B)) % size``) instead of the reference's two-branch
  slice copy (:46-62); identical result for any batch ≤ memory_size,
  including the wraparound case, and trace-safe (no data-dependent Python
  branch).
- Retrieval considers the first ``max(n_neighbours, added)`` slots, exactly
  like the reference's ``mask_idx`` (:76-78): before the memory holds
  ``n_neighbours`` real entries, blank slots (zero embedding, label ==
  n_classes i.e. "unseen") are eligible and are returned with their true
  distance, matching the reference's early-episode behavior. The mask is a
  distance penalty on invalid slots rather than a dynamic slice (static
  shapes for XLA).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class MemoryState:
    """Device-resident episodic memory (a pytree; scan-carry friendly)."""

    embeds: jnp.ndarray        # [memory_size, embed_dim] float32
    labels: jnp.ndarray        # [memory_size] int32; n_classes == "unseen"
    write_pointer: jnp.ndarray  # [] int32, next slot to write
    added: jnp.ndarray         # [] int32, total entries ever written

    @property
    def memory_size(self) -> int:
        return self.embeds.shape[0]

    @property
    def embed_dim(self) -> int:
        return self.embeds.shape[1]


def init_memory(memory_size: int, embed_dim: int, n_classes: int) -> MemoryState:
    """Blank memory: zero embeddings, all labels "unseen" (== n_classes),
    as in the reference constructor (memory_store.py:14-20)."""
    return MemoryState(
        embeds=jnp.zeros((memory_size, embed_dim), jnp.float32),
        labels=jnp.full((memory_size,), n_classes, jnp.int32),
        write_pointer=jnp.zeros((), jnp.int32),
        added=jnp.zeros((), jnp.int32),
    )


def flush(state: MemoryState, n_classes: int) -> MemoryState:
    """Reset to blank between episodes (memory_store.py:91-97)."""
    return init_memory(state.memory_size, state.embed_dim, n_classes)


def add_entries(state: MemoryState, embeds: jnp.ndarray,
                labels: jnp.ndarray) -> MemoryState:
    """Ring-buffer write of a batch (memory_store.py:38-63).

    ``embeds``: [batch, embed_dim]; ``labels``: [batch] int. Requires
    batch ≤ memory_size (the reference silently corrupts state beyond
    that). A single-entry write is just batch == 1.
    """
    batch = embeds.shape[0]
    if batch > state.memory_size:
        raise ValueError(
            f"cannot write {batch} entries into a {state.memory_size}-slot memory")
    idx = (state.write_pointer + jnp.arange(batch, dtype=jnp.int32)) % state.memory_size
    return state.replace(
        embeds=state.embeds.at[idx].set(embeds.astype(state.embeds.dtype)),
        labels=state.labels.at[idx].set(labels.astype(state.labels.dtype)),
        write_pointer=(state.write_pointer + batch) % state.memory_size,
        added=state.added + batch,
    )


def nearest_entries(state: MemoryState, queries: jnp.ndarray,
                    n_neighbours: int):
    """kNN retrieval by squared-L2 distance (memory_store.py:65-89).

    ``queries``: [n_queries, embed_dim]. Returns
    (embeds [n_queries, n_neighbours, embed_dim],
     labels [n_queries, n_neighbours],
     distances [n_queries, n_neighbours]) — nearest first, true squared
    distances (the reference negates topk(-dist) back, :87-88).
    """
    q = queries.astype(jnp.float32)
    m = state.embeds
    # ||q - m||^2 = ||q||^2 - 2 q.m + ||m||^2 (memory_store.py:81-84); one
    # [n_queries, memory_size] matmul — MXU-friendly at any memory size.
    dist = (jnp.sum(q * q, axis=1, keepdims=True)
            - 2.0 * (q @ m.T)
            + jnp.sum(m * m, axis=1)[None, :])
    # Eligible slots: first max(n_neighbours, added) (clamped to size), as
    # the reference's mask_idx slice (:76-78) — expressed as an additive
    # penalty so shapes stay static.
    mask_idx = jnp.minimum(
        jnp.asarray(state.memory_size, jnp.int32),
        jnp.maximum(jnp.asarray(n_neighbours, jnp.int32), state.added))
    invalid = jnp.arange(state.memory_size, dtype=jnp.int32)[None, :] >= mask_idx
    dist = jnp.where(invalid, jnp.float32(jnp.finfo(jnp.float32).max / 2), dist)
    neg_top, idx = jax.lax.top_k(-dist, n_neighbours)
    return state.embeds[idx], state.labels[idx], -neg_top


def num_entries(state: MemoryState) -> jnp.ndarray:
    """Current fill level, min(memory_size, added) (memory_store.py:22-23)."""
    return jnp.minimum(jnp.asarray(state.memory_size, jnp.int32), state.added)
