"""Mapping network: z_1..z_k -> w_1..w_k with optional latent self-attention.

Behavioral spec: `MappingNetwork` + `MLP` in the reference training/networks.py
(:833-942, :179-221). Local components go through a (resnet) MLP with optional
self-attention between the k-1 latents; the global component goes through a
separate MLP (optionally conditioned on a label embedding); outputs are
broadcast to num_ws and truncated against the tracked w average.

The w average is a flax variable in the 'moving_stats' collection, updated
during training exactly like the reference's EMA (networks.py:925-927).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from morphganformer_tpu.models.config import GANformerConfig
from morphganformer_tpu.models.layers import (
    FullyConnected,
    ResnetLayer,
    normalize_l2,
    runtime_coef,
    weight_init,
)
from morphganformer_tpu.models.transformer import TransformerLayer
from morphganformer_tpu.ops import bias_act


class MLP(nn.Module):
    """Multi-layer (optionally resnet / self-attentive) network over the last
    axis (reference MLP, networks.py:179-221). x: [B, T, D] or [B, D]."""
    channels: tuple
    act: str
    resnet: bool = False
    sa: bool = False
    pool: bool = False
    lrmul: float = 1.0
    # Self-attention kwargs (only when sa=True).
    sa_to_len: int = 0
    sa_gate: bool = False
    num_heads: int = 1
    attention_dropout: float = 0.12

    @nn.compact
    def __call__(self, x, pos=None, mask=None, train: bool = False):
        shape = x.shape
        if x.ndim > 2 and self.pool:
            x = x.reshape(shape[0], -1)  # shared mapping: one big vector

        layers_num = len(self.channels) // 2 if self.resnet else len(self.channels) - 1
        for idx in range(layers_num):
            skip = x
            if self.sa:
                in_dim = self.channels[idx]
                sa = TransformerLayer(
                    dim=in_dim, pos_dim=in_dim, from_len=self.sa_to_len,
                    to_len=self.sa_to_len, from_dim=in_dim, to_dim=in_dim,
                    from_gate=self.sa_gate, to_gate=self.sa_gate,
                    num_heads=self.num_heads,
                    attention_dropout=self.attention_dropout,
                    name=f"sa{idx}",
                )
                x, _, _ = sa(x, x, from_pos=pos, to_pos=pos, att_mask=mask,
                             train=train)
            if self.resnet:
                assert self.channels[idx] == self.channels[idx + 1]
                x = ResnetLayer(self.channels[idx], act=self.act,
                                lrmul=self.lrmul, name=f"l{idx}")(x, skip)
            else:
                x = FullyConnected(self.channels[idx + 1], act=self.act,
                                   lrmul=self.lrmul, name=f"l{idx}")(x)

        x = FullyConnected(self.channels[-1], act=self.act, lrmul=self.lrmul,
                           name="out_layer")(x)
        if self.pool and len(shape) > 2:
            x = x.reshape(shape[0], *shape[1:-1], -1)
        return x


class _FCParams(nn.Module):
    """Declares FullyConnected's param tree (weight/bias) without computing.

    Used by the fused mapping path so the params live at exactly the same
    paths (and with the same initializers) as an actually-called
    FullyConnected — converted checkpoints and the unfused path share one
    variables dict."""
    features: int
    lrmul: float = 1.0

    @nn.compact
    def __call__(self, in_features: int):
        w = self.param("weight", weight_init(self.lrmul),
                       (in_features, self.features))
        b = self.param("bias", lambda k, s: jnp.full(s, 0.0, jnp.float32),
                       (self.features,))
        return w, b


class _ResnetParams(nn.Module):
    """Param tree of a ResnetLayer (fc0 + fc1), declaration only."""
    channels: int
    lrmul: float = 1.0

    @nn.compact
    def __call__(self, in_features: int):
        p0 = _FCParams(self.channels, self.lrmul, name="fc0")(in_features)
        p1 = _FCParams(self.channels, self.lrmul, name="fc1")(self.channels)
        return p0, p1


class _MLPParams(nn.Module):
    """Param tree of a resnet MLP (l{i} + out_layer), declaration only."""
    channels: tuple
    lrmul: float = 1.0

    @nn.compact
    def __call__(self):
        n = len(self.channels) // 2
        layers = []
        for idx in range(n):
            assert self.channels[idx] == self.channels[idx + 1]
            layers.append(_ResnetParams(self.channels[idx + 1], self.lrmul,
                                        name=f"l{idx}")(self.channels[idx]))
        out = _FCParams(self.channels[-1], self.lrmul,
                        name="out_layer")(self.channels[n])
        return layers, out


def _dual_fc(x, k, wc, bc, wg, bg, lrmul, act):
    """One batched FC over [B, k, D] where rows 0..k-2 use the component
    weights (wc, bc) and row k-1 uses the global weights (wg, bg).

    Replaces two separate small matmuls (component MLP + global MLP) with a
    single [k]-batched einsum: at mapping sizes (k=17, D=32) every op in the
    chain is latency-bound on TPU, so halving the sequential op count is the
    win (VERDICT r2 #8; reference networks.py:833-942 runs the two chains as
    separate submodules)."""
    coef = runtime_coef(wc.shape[0], 1.0, lrmul)
    w_rows = jnp.concatenate(
        [jnp.broadcast_to(wc[None], (k - 1, *wc.shape)), wg[None]], axis=0)
    b_rows = jnp.concatenate(
        [jnp.broadcast_to(bc[None], (k - 1, bc.shape[0])), bg[None]], axis=0)
    y = jnp.einsum("bki,kio->bko", x, w_rows * coef)
    y = y + (b_rows * lrmul)[None]
    if act == "linear":
        return y
    return bias_act(y, act=act)


class _FusedMLP(nn.Module):
    """Component-side MLP that also carries the global chain as its k-th row.

    Owns the component MLP's param tree (l{i}/fc0,fc1, out_layer, sa{i}) at
    the same paths the unfused `MLP` uses; the global MLP's weights are
    passed in (declared by a sibling `_MLPParams` named "global_mlp").
    Computes both chains with one `_dual_fc` per FC instead of two separate
    submodule chains — mathematically identical, half the sequential ops."""
    channels: tuple
    lrmul: float = 1.0
    act: str = "lrelu"
    sa: bool = False
    sa_to_len: int = 0
    sa_gate: bool = False
    num_heads: int = 1
    attention_dropout: float = 0.12

    @nn.compact
    def __call__(self, x, global_weights, pos=None, mask=None,
                 train: bool = False):
        g_layers, g_out = global_weights
        k = x.shape[1]  # components + 1 global (last row)
        n = len(self.channels) // 2
        for idx in range(n):
            assert self.channels[idx] == self.channels[idx + 1]
            skip = x  # pre-attention skip, exactly as MLP (skip = x before sa)
            if self.sa:
                in_dim = self.channels[idx]
                sa = TransformerLayer(
                    dim=in_dim, pos_dim=in_dim, from_len=self.sa_to_len,
                    to_len=self.sa_to_len, from_dim=in_dim, to_dim=in_dim,
                    from_gate=self.sa_gate, to_gate=self.sa_gate,
                    num_heads=self.num_heads,
                    attention_dropout=self.attention_dropout,
                    name=f"sa{idx}",
                )
                comp, _, _ = sa(x[:, : k - 1], x[:, : k - 1], from_pos=pos,
                                to_pos=pos, att_mask=mask, train=train)
                x = jnp.concatenate([comp, x[:, k - 1:]], axis=1)
            (wc0, bc0), (wc1, bc1) = _ResnetParams(
                self.channels[idx + 1], self.lrmul,
                name=f"l{idx}")(self.channels[idx])
            (wg0, bg0), (wg1, bg1) = g_layers[idx]
            h = _dual_fc(x, k, wc0, bc0, wg0, bg0, self.lrmul, self.act)
            h = _dual_fc(h, k, wc1, bc1, wg1, bg1, self.lrmul, "linear")
            x = jax.nn.leaky_relu(h + skip, 0.2)
        wco, bco = _FCParams(self.channels[-1], self.lrmul,
                             name="out_layer")(self.channels[n])
        wgo, bgo = g_out
        return _dual_fc(x, k, wco, bco, wgo, bgo, self.lrmul, self.act)


class MappingNetwork(nn.Module):
    """Reference MappingNetwork (networks.py:833-942)."""
    cfg: GANformerConfig

    @nn.compact
    def __call__(self, z, c=None, pos=None, mask=None, truncation_psi=1.0,
                 truncation_cutoff: Optional[int] = None, train: bool = False,
                 skip_w_avg_update: bool = False):
        cfg = self.cfg
        m = cfg.mapping
        k, z_dim, w_dim = cfg.k, cfg.z_dim, cfg.w_dim
        assert z.shape[1:] == (k, z_dim), f"z must be [B,{k},{z_dim}], got {z.shape}"

        layer_dim = m.layer_dim or w_dim
        embed_dim = (m.embed_dim or z_dim) if cfg.c_dim > 0 else 0
        layers = [layer_dim] * (m.num_layers - 1) + [w_dim]

        # Profiling spans mirror the reference's record_function names
        # (networks.py:896,926,931,936); they surface in XLA profiles.
        with jax.named_scope("input"):
            if cfg.transformer:
                z_comp, g = z[:, : k - 1], z[:, k - 1:]
                if m.normalize_global:
                    g = normalize_l2(g)
                z_comp = normalize_l2(z_comp)
                x = g
            else:
                z_comp = None
                x = normalize_l2(z)

        if cfg.c_dim > 0:
            y = FullyConnected(embed_dim, name="embed")(c.astype(jnp.float32))
            y = normalize_l2(y)
            x = jnp.concatenate([x, y[:, None, :]], axis=-1)

        # The fused path runs the global + component chains as one batched
        # computation (VERDICT r2 #8); eligible whenever the two MLPs are
        # structurally identical. Param trees are identical either way.
        fused = (m.fused and cfg.transformer and cfg.c_dim == 0
                 and m.resnet and not m.shared)

        if fused:
            g_weights = _MLPParams(tuple([z_dim] + layers), lrmul=m.lrmul,
                                   name="global_mlp")()
            x_all = jnp.concatenate([z_comp, x], axis=1)  # comps first
            x = _FusedMLP(tuple([z_dim] + layers), lrmul=m.lrmul, act=m.act,
                          sa=m.ltnt2ltnt, sa_to_len=k - 1,
                          sa_gate=m.ltnt_gate,
                          num_heads=cfg.attention.num_heads,
                          attention_dropout=cfg.attention.dropout,
                          name="mlp")(x_all, g_weights,
                                      pos=pos if m.use_pos else None,
                                      mask=mask, train=train)
        else:
            # Global component MLP (reference networks.py:884,918).
            x = MLP(tuple([z_dim + embed_dim] + layers), act=m.act,
                    resnet=m.resnet, lrmul=m.lrmul,
                    name="global_mlp")(x, train=train)

            if cfg.transformer:
                p = MLP(tuple([z_dim] + layers), act=m.act, resnet=m.resnet,
                        lrmul=m.lrmul, sa=m.ltnt2ltnt and not m.shared,
                        pool=m.shared, sa_to_len=k - 1, sa_gate=m.ltnt_gate,
                        num_heads=cfg.attention.num_heads,
                        attention_dropout=cfg.attention.dropout,
                        name="mlp")(z_comp, pos=pos if m.use_pos else None,
                                    mask=mask, train=train)
                x = jnp.concatenate([p, x], axis=1)  # components, global last

        # Track moving average of w (reference networks.py:925-927).
        w_avg = self.variable("moving_stats", "w_avg",
                              lambda: jnp.zeros([w_dim], jnp.float32))
        if train and m.w_avg_beta is not None and not skip_w_avg_update \
                and not self.is_initializing():
            batch_mean = jnp.mean(jax.lax.stop_gradient(x), axis=(0, 1))
            w_avg.value = batch_mean + m.w_avg_beta * (w_avg.value - batch_mean)

        # Broadcast to num_ws (reference networks.py:930-932).
        with jax.named_scope("broadcast"):
            num_ws = cfg.num_ws
            x = jnp.repeat(x[:, :, None, :], num_ws, axis=2)  # [B,k,num_ws,w]

        # Truncation (reference networks.py:935-941).
        if truncation_psi != 1:
            with jax.named_scope("truncate"):
                assert m.w_avg_beta is not None
                if truncation_cutoff is None:
                    x = w_avg.value + truncation_psi * (x - w_avg.value)
                else:
                    head = w_avg.value + truncation_psi * (
                        x[:, :, :truncation_cutoff] - w_avg.value)
                    x = jnp.concatenate([head, x[:, :, truncation_cutoff:]],
                                        axis=2)
        return x
