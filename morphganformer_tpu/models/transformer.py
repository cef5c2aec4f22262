"""Bipartite (duplex) attention between image positions and latent components.

Behavioral spec: `TransformerLayer` in the reference training/networks.py
(:558-822), including the k-means duplex mechanism (compute_centroids
:687-722, compute_assignments :521-524, att_norm :341-358, GateAttention
:532-554). The reference's from/to convention is kept: information flows
to->from, i.e. `to_tensor` (latents) modulates `from_tensor` (pixels).

TPU-first notes:
  * Tensors stay batched 3D ([B, len, dim]) instead of the reference's
    flattened-2D convention — XLA batches the matmuls directly on the MXU.
    With F = res^2 image tokens and T = k-1 = 16 latents, cost is linear in
    pixels (never pixel<->pixel attention); this is the architecture's honest
    sequence-scaling story (SURVEY.md §5.7).
  * Softmax/normalization run in float32 regardless of compute dtype.
  * Fixes the reference's construction-time bug where `self.dim` is used but
    never assigned (networks.py:581,616-617,814).
  * Fixes the reference's `torch.split(control, 2)` bug for
    integration="both" (networks.py:664) by splitting in half as intended.

A Pallas flash-style kernel for the F-blocked attention is a planned
optimization; the XLA path below is already matmul-bound.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from morphganformer_tpu.models.layers import FullyConnected, logits_mask
from morphganformer_tpu.ops import nearest_neighbors_kernel, upsample2d


def _to_heads(x, num_heads, head_size):
    """[B, L, N*H] -> [B, N, L, H] (reference transpose_for_scores,
    networks.py:499-502)."""
    b, l, _ = x.shape
    x = x.reshape(b, l, num_heads, head_size)
    return x.transpose(0, 2, 1, 3)


def _from_heads(x):
    """[B, N, L, H] -> [B, L, N*H]."""
    b, n, l, h = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, n * h)


def compute_assignments(att_probs):
    """Normalize attention over the 'from' axis to get the relative weight of
    each 'from' element per 'to' centroid: [B,N,F,T] -> [B,N,T,F]
    (reference networks.py:521-524)."""
    a = att_probs / (jnp.sum(att_probs, axis=-2, keepdims=True) + 1e-8)
    return a.transpose(0, 1, 3, 2)


def _upsample_assignments(to_from, num_heads, to_len, from_len):
    """Nearest-neighbor-upsample carried centroid assignments when the
    corresponding token grid doubled in resolution
    (reference networks.py:693-706). to_from: [B, N, T', F']."""
    b = to_from.shape[0]
    if to_from.shape[-2] < to_len:
        s = int(round(to_from.shape[-2] ** 0.5))
        x = to_from.reshape(-1, s, s, to_from.shape[-1])          # NHWC over the T grid
        x = upsample2d(x, nearest_neighbors_kernel(2))
        to_from = x.reshape(b, num_heads, to_len, to_from.shape[-1])
    if to_from.shape[-1] < from_len:
        s = int(round(to_from.shape[-1] ** 0.5))
        x = to_from.reshape(-1, to_from.shape[-2], s, s)
        x = x.transpose(0, 2, 3, 1)                                # -> NHWC over the F grid
        x = upsample2d(x, nearest_neighbors_kernel(2))
        x = x.transpose(0, 3, 1, 2)
        to_from = x.reshape(b, num_heads, to_len, from_len)
    return to_from


def att_norm(x, integration: str, norm: Optional[str]):
    """Normalize attention features without scale/bias (those come from the
    latent modulation). x: [B, L, C]; norm='instance' normalizes over L,
    'layer' over C (reference att_norm, networks.py:341-358)."""
    if norm is None:
        return x
    x = x.astype(jnp.float32)
    axis = 1 if norm == "instance" else 2
    if integration in ("add", "both"):
        x = x - jnp.mean(x, axis=axis, keepdims=True)
    if integration in ("mul", "both"):
        x = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + 1e-8)
    return x


class GateAttention(nn.Module):
    """Sigmoid gating of attention rows/columns (reference GateAttention,
    networks.py:532-554). Only constructed when gating is on."""
    dim: int
    pos_dim: int
    num_heads: int
    from_len: int
    to_len: int
    gate_bias: float = 0.0

    @nn.compact
    def __call__(self, att_probs, tensor, pos):
        gate = FullyConnected(self.num_heads, name="gate")(tensor)
        if pos is not None:
            gate = gate + FullyConnected(self.num_heads, name="gate_pos")(pos)
        gate = jax.nn.sigmoid(gate + self.gate_bias)
        # tensor is [B, from_len*to_len(one of them is 1), ...]; reshape to
        # [B, from_len, to_len, N] then [B, N, from_len, to_len].
        gate = gate.reshape(-1, self.from_len, self.to_len, self.num_heads)
        gate = gate.transpose(0, 3, 1, 2)
        return att_probs * gate


class TransformerLayer(nn.Module):
    """Duplex bipartite attention layer (reference networks.py:558-822).

    from_tensor: [B, F, from_dim] (e.g. image positions, F = res^2)
    to_tensor:   [B, T, to_dim]   (e.g. latent components, T = k-1)
    from_pos:    [F, pos_dim] or None
    to_pos:      [T, pos_dim] or None
    att_vars:    {"centroid_assignments": [B, N, T', F'] or None}
    att_mask:    [B, T] keep-mask or None
    """
    dim: int
    pos_dim: int
    from_len: int
    to_len: int
    from_dim: int
    to_dim: int
    from_gate: bool = False
    to_gate: bool = False
    num_heads: int = 1
    attention_dropout: float = 0.12
    integration: str = "add"
    norm: Optional[str] = None
    kmeans: bool = False
    kmeans_iters: int = 1
    iterative: bool = False

    @property
    def size_head(self) -> int:
        return self.dim // self.num_heads

    @property
    def centroid_dim(self) -> int:
        return 2 * self.size_head

    @property
    def parametric(self) -> bool:
        return not self.iterative

    def _compute_centroids(self, _queries, queries, to_from):
        """K-means centroid computation (reference networks.py:687-722).
        Returns (from_elements [B,N,F,2H], to_centroids [B,N,T,2H], to_from).

        Perf note: in parametric mode the reference computes the carried-
        assignment centroids and immediately overwrites them with the
        parameter (networks.py:693-717) — dead work that includes a massive
        res^2-channel nearest-neighbor upsample. We skip it (and the carry
        itself, see __call__) when parametric."""
        from_elements = jnp.concatenate([_queries, queries - _queries], axis=-1)
        from_elements = _to_heads(from_elements, self.num_heads, self.centroid_dim)

        to_centroids = None
        if to_from is not None and not self.parametric:
            to_from = _upsample_assignments(to_from, self.num_heads, self.to_len,
                                            self.from_len)
            to_centroids = to_from @ from_elements

        if to_from is None or self.parametric:
            if self.parametric:
                centroids = self.param(
                    "centroids", nn.initializers.normal(stddev=1.0),
                    (1, self.num_heads, self.to_len, self.centroid_dim),
                )
                to_centroids = jnp.tile(centroids, (from_elements.shape[0], 1, 1, 1))
            else:
                q2c = FullyConnected(self.dim * self.num_heads,
                                     name="queries2centroids")(queries)
                to_centroids = _to_heads(
                    q2c.reshape(q2c.shape[0], -1, self.dim * self.num_heads)
                    .reshape(q2c.shape[0], self.to_len, -1),
                    self.num_heads, self.centroid_dim)
        return from_elements, to_centroids, to_from

    @nn.compact
    def __call__(self, from_tensor, to_tensor, from_pos=None, to_pos=None,
                 att_vars=None, att_mask=None, train: bool = False):
        assert from_tensor.ndim == 3 and to_tensor.ndim == 3
        b = from_tensor.shape[0]
        att_vars = att_vars or {}
        to_from = att_vars.get("centroid_assignments")

        # Q/K/V projections (+ positional maps, reference networks.py:603-609).
        queries = FullyConnected(self.dim, name="to_queries")(from_tensor)
        keys = FullyConnected(self.dim, name="to_keys")(to_tensor)
        values = FullyConnected(self.dim, name="to_values")(to_tensor)
        _queries = queries

        if from_pos is not None:
            queries = queries + FullyConnected(self.dim, name="from_pos_map")(
                from_pos.astype(queries.dtype))[None]
        if to_pos is not None:
            keys = keys + FullyConnected(self.dim, name="to_pos_map")(
                to_pos.astype(keys.dtype))[None]

        if self.kmeans:
            from_elements, to_centroids, to_from = self._compute_centroids(
                _queries, queries, to_from)
            att_weight = self.param(
                "att_weight", nn.initializers.ones,
                (self.num_heads, 1, self.centroid_dim),
            )

        values_h = _to_heads(values, self.num_heads, self.size_head)    # [B,N,T,H]
        queries_h = _to_heads(queries, self.num_heads, self.size_head)  # [B,N,F,H]
        keys_h = _to_heads(keys, self.num_heads, self.size_head)        # [B,N,T,H]

        att_scores = jnp.einsum("bnfh,bnth->bnft", queries_h, keys_h)
        att_probs = None

        scale = 1.0 / (float(self.size_head) ** 0.5)
        for i in range(self.kmeans_iters):
            if self.kmeans:
                if i > 0:
                    to_from = compute_assignments(att_probs)
                    to_centroids = to_from @ from_elements
                # Scores from dot products of 'from' elements with centroids.
                att_scores = jnp.einsum(
                    "bnfc,bntc->bnft",
                    from_elements * att_weight.astype(from_elements.dtype)[None],
                    to_centroids)
            att_scores = att_scores * scale
            if att_mask is not None:
                att_scores = logits_mask(att_scores, att_mask[:, None, None, :])
            # Softmax always in f32; double dropout (elementwise + per-'to'
            # column) matches reference compute_probs (networks.py:505-513).
            att_probs = jax.nn.softmax(att_scores.astype(jnp.float32), axis=-1)
            if train and self.attention_dropout > 0:
                rate = self.attention_dropout / 2
                att_probs = nn.Dropout(rate, deterministic=False)(att_probs)
                keep = nn.Dropout(rate, deterministic=False)(
                    jnp.ones((b, self.num_heads, 1, self.to_len), att_probs.dtype))
                att_probs = att_probs * keep

        if self.to_gate:
            att_probs = GateAttention(self.dim, self.pos_dim, self.num_heads,
                                      from_len=1, to_len=self.to_len,
                                      name="to_gate_attention")(
                att_probs, to_tensor, to_pos[None] if to_pos is not None else None)
        if self.from_gate:
            att_probs = GateAttention(self.dim, self.pos_dim, self.num_heads,
                                      from_len=self.from_len, to_len=1, gate_bias=1.0,
                                      name="from_gate_attention")(
                att_probs, from_tensor,
                from_pos[None] if from_pos is not None else None)

        if self.kmeans and not self.parametric:
            # The cross-layer assignment carry only feeds the next layer's
            # centroid computation, which parametric mode ignores.
            to_from = compute_assignments(att_probs)
        elif self.parametric:
            to_from = None

        # Weighted sum of values -> modulation control (networks.py:812-816).
        control = jnp.einsum("bnft,bnth->bnfh",
                             att_probs.astype(values_h.dtype), values_h)
        control = _from_heads(control)                                   # [B,F,dim]

        # Integrate: normalize from_tensor, then latent-driven bias/gain
        # (reference integrate, networks.py:657-672).
        out = att_norm(from_tensor, self.integration, self.norm)
        control_dim = 2 * self.dim if self.integration == "both" else self.dim
        control = FullyConnected(control_dim, name="modulation")(
            control.astype(from_tensor.dtype))
        if self.integration == "both":
            gain, bias = jnp.split(control, 2, axis=-1)
        else:
            gain = bias = control
        if self.integration != "add":
            out = out * (gain.astype(out.dtype) + 1.0)
        if self.integration != "mul":
            out = out + bias.astype(out.dtype)

        return out.astype(from_tensor.dtype), att_probs, {"centroid_assignments": to_from}
