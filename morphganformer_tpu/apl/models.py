"""Adaptive Posterior Learning (APL) modules — relational episodic classifier.

Behavioral spec: reference apl/models.py — MHDPA self-attention (:7-92),
NormMLP (:95-103), ResidualTransform (:106-116), the relational
self-attention feed-forward decoder RSAFFDecoder (:119-191), and the
strided-conv Encoder (:194-233). The reference module is an unused appendix
of the morphing pipeline (SURVEY.md §2.5) ported here for inventory
completeness; everything is flax.linen with einsum attention so episodes
jit/scan cleanly on TPU together with apl/memory.py.

Faithfulness notes:
- MHDPA layer-norms the QKV projection jointly over the (slots, features)
  pair of axes with a per-(slot, feature) affine — exactly torch
  ``nn.LayerNorm([memory_slots, projection_size])`` (models.py:30-31); this
  ties the module to a static slot count, which is also what XLA wants.
- The decoder softmaxes the *negated* distances once and uses that same
  weighting both as a concatenated input feature and for the final
  distance-weighted readout (models.py:174-188).
- The reference Encoder hard-codes ``LayerNorm(32)`` (models.py:226) which
  only type-checks when the flattened feature count is 32; here the final
  norm covers whatever the flatten actually produces, and an optional Dense
  maps to ``embed_dim`` so the encoder composes with the memory store.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _joint_layer_norm(mdl: nn.Module, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm over the last TWO axes with affine of that joint shape
    (torch nn.LayerNorm([N, F]) semantics, reference models.py:30-31)."""
    shape = x.shape[-2:]
    scale = mdl.param(f"{name}_scale", nn.initializers.ones, shape)
    bias = mdl.param(f"{name}_bias", nn.initializers.zeros, shape)
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.var(x, axis=(-2, -1), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class MHDPA(nn.Module):
    """Multi-head dot-product self-attention over memory slots
    (reference models.py:7-92)."""

    memory_slots: int
    key_size: int
    value_size: int
    n_heads: int

    @nn.compact
    def __call__(self, memory: jnp.ndarray) -> jnp.ndarray:
        # memory: [B, N, M] with M = value_size * n_heads.
        n = memory.shape[1]
        qkv_size = 2 * self.key_size + self.value_size
        qkv = nn.Dense(self.n_heads * qkv_size, name="qkv_projector")(memory)
        qkv = _joint_layer_norm(self, "qkv_layernorm", qkv)
        # [B, N, H*F] -> [B, N, H, F]; split into q/k/v along F.
        qkv = qkv.reshape(qkv.shape[0], n, self.n_heads, qkv_size)
        q, k, v = jnp.split(
            qkv, [self.key_size, 2 * self.key_size], axis=-1)
        q = q * (self.key_size ** -0.5)          # models.py:78
        logits = jnp.einsum("bnhk,bmhk->bhnm", q, k)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bmhv->bnhv", weights, v)
        return out.reshape(out.shape[0], n, self.n_heads * self.value_size)


class NormMLP(nn.Module):
    """layer_norm(linear(relu(x))) (reference models.py:95-103)."""

    output_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm()(nn.Dense(self.output_size)(nn.relu(x)))


class ResidualTransform(nn.Module):
    """One relational block: residual MHDPA then residual NormMLP
    (reference models.py:106-116)."""

    n_neighbours: int
    key_size: int
    value_size: int
    n_heads: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + MHDPA(self.n_neighbours, self.key_size, self.value_size,
                      self.n_heads, name="attention")(x)
        x = x + NormMLP(self.hidden_dim, name="norm_mlp")(x)
        return x


class RSAFFDecoder(nn.Module):
    """Relational self-attention feed-forward decoder
    (reference models.py:119-191): classify a query embedding from its
    retrieved neighbours, their labels, and the retrieval distances."""

    n_classes: int
    query_embed_dim: int
    label_embed_dim: int
    n_neighbours: int
    key_size: int
    value_size: int
    n_heads: int
    num_layers: int

    @nn.compact
    def __call__(self, buffer_embeds: jnp.ndarray, buffer_labels: jnp.ndarray,
                 query: jnp.ndarray, distances: jnp.ndarray) -> jnp.ndarray:
        """buffer_embeds: [B, N, E]; buffer_labels: [B, N] int (n_classes ==
        "unseen"); query: [B, E]; distances: [B, N]. Returns logits
        [B, n_classes]."""
        hidden_dim = self.value_size * self.n_heads
        # Closest entries get the largest weight (models.py:174).
        weights = jax.nn.softmax(-distances, axis=1)
        # One extra row for the blank/"unseen" label (models.py:152-154).
        label_embeds = nn.Embed(self.n_classes + 1, self.label_embed_dim,
                                name="label_embeddings")(buffer_labels)
        query_copies = jnp.broadcast_to(
            query[:, None, :], (*buffer_embeds.shape[:2], query.shape[-1]))
        concat = jnp.concatenate(
            [buffer_embeds, label_embeds, query_copies, weights[..., None]],
            axis=-1)
        memory = nn.Dense(hidden_dim, name="pre_transform")(concat)
        for i in range(self.num_layers):
            memory = ResidualTransform(
                self.n_neighbours, self.key_size, self.value_size,
                self.n_heads, hidden_dim, name=f"residual_{i}")(memory)
        # Distance-weighted readout with the same softmaxed weights
        # (models.py:185-188).
        pooled = jnp.sum(memory * weights[..., None], axis=1)
        return nn.Dense(self.n_classes, name="logits")(pooled)


class _BasicBlock(nn.Module):
    """conv(relu(batchnorm(x))) (reference models.py:194-202)."""

    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.BatchNorm(use_running_average=not train, name="batch_norm")(x)
        return nn.Conv(64, (3, 3), strides=(self.stride, self.stride),
                       padding=[(1, 1), (1, 1)], name="conv")(nn.relu(x))


class _BlockCombo(nn.Module):
    """Stride-2 block followed by two residual stride-1 blocks
    (reference models.py:205-217)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        out = _BasicBlock(2, name="block1")(x, train)
        out = out + _BasicBlock(1, name="block2")(out, train)
        out = out + _BasicBlock(1, name="block3")(out, train)
        return out


class Encoder(nn.Module):
    """Image -> embedding encoder (reference models.py:220-233): one 3x3
    conv to 64 channels, five BlockCombos (each halving resolution), flatten,
    LayerNorm. NHWC. ``embed_dim=None`` keeps the raw flattened size (the
    reference's behavior when its hard-coded 32 happens to match);
    otherwise a final Dense projects to ``embed_dim``."""

    embed_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], name="conv")(x)
        for i in range(5):
            x = _BlockCombo(name=f"combo_{i}")(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.LayerNorm(name="norm")(x)
        if self.embed_dim is not None and self.embed_dim != x.shape[-1]:
            x = nn.Dense(self.embed_dim, name="proj")(x)
        return x
