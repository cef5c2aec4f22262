"""GANformer generator (reference Generator, training/networks.py:1269-1331).

z [B, k, z_dim] -> MappingNetwork -> ws [B, k, num_ws, w_dim]
-> SynthesisNetwork -> img [B, H, W, C] in [-1, 1] (NHWC).

The training loss uses the `run_mapping` / `run_synthesis` methods (the
reference's `subnet="mapping"/"synthesis"` split API, networks.py:1304-1331).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from morphganformer_tpu.models.config import GANformerConfig
from morphganformer_tpu.models.layers import random_dp_binary
from morphganformer_tpu.models.mapping import MappingNetwork
from morphganformer_tpu.models.synthesis import SynthesisNetwork


class Generator(nn.Module):
    cfg: GANformerConfig

    def setup(self):
        cfg = self.cfg
        # Trainable per-component positional embeddings (networks.py:1295,486-491).
        self.pos = self.param("pos", nn.initializers.uniform(scale=1.0),
                              (cfg.k - 1, cfg.w_dim))
        self.mapping = MappingNetwork(cfg, name="mapping")
        self.synthesis = SynthesisNetwork(cfg, name="synthesis")

    def _component_mask(self, batch, train):
        cfg = self.cfg
        if train and cfg.component_dropout > 0:
            return random_dp_binary(self.make_rng("mask"),
                                    (batch, cfg.k - 1), cfg.component_dropout)
        return jnp.ones((batch, cfg.k - 1), jnp.float32)

    def run_mapping(self, z, c=None, truncation_psi=1.0, truncation_cutoff=None,
                    train: bool = False, skip_w_avg_update: bool = False,
                    mask=None):
        if mask is None:
            mask = self._component_mask(z.shape[0], train)
        return self.mapping(z, c, pos=self.pos, mask=mask,
                            truncation_psi=truncation_psi,
                            truncation_cutoff=truncation_cutoff, train=train,
                            skip_w_avg_update=skip_w_avg_update)

    def run_synthesis(self, ws, noise_mode="random", train: bool = False,
                      return_att: bool = False, mask=None):
        if mask is None:
            mask = self._component_mask(ws.shape[0], train)
        return self.synthesis(ws, pos=self.pos, mask=mask, noise_mode=noise_mode,
                              train=train, return_att=return_att)

    def __call__(self, z=None, c=None, ws=None, truncation_psi=1.0,
                 truncation_cutoff=None, noise_mode="random",
                 train: bool = False, return_att: bool = False,
                 return_ws: bool = False):
        """Full forward. Returns img, or a tuple including attention maps /
        ws when requested (reference networks.py:1304-1331)."""
        batch = (z if z is not None else ws).shape[0]
        mask = self._component_mask(batch, train)

        if ws is None:
            ws = self.run_mapping(z, c, truncation_psi=truncation_psi,
                                  truncation_cutoff=truncation_cutoff,
                                  train=train, mask=mask)
        img, att = self.run_synthesis(ws, noise_mode=noise_mode, train=train,
                                      return_att=return_att, mask=mask)
        ret = (img,)
        if return_att:
            ret += (att,)
        if return_ws:
            ret += (ws,)
        return ret if len(ret) > 1 else img

    @property
    def input_shape(self):
        return [None, self.cfg.k, self.cfg.z_dim]


def init_generator(cfg: GANformerConfig, seed: int = 0, batch: int = 1):
    """Initialize generator variables. Returns (model, variables).

    The init is wrapped in jit: un-jitted tracing executes op-by-op, which is
    pathologically slow on remote-dispatch TPU backends."""
    model = Generator(cfg)
    z = jnp.zeros((batch, cfg.k, cfg.z_dim), jnp.float32)
    c = jnp.zeros((batch, cfg.c_dim), jnp.float32) if cfg.c_dim > 0 else None
    rngs = {"params": jax.random.PRNGKey(seed),
            "noise": jax.random.PRNGKey(seed + 1),
            "mask": jax.random.PRNGKey(seed + 2),
            "dropout": jax.random.PRNGKey(seed + 3)}
    init_fn = jax.jit(lambda r, zz: model.init(r, zz, c, noise_mode="const"))
    variables = init_fn(rngs, z)
    return model, variables
