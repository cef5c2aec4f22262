"""Native checkpoint format: arch.json + params.msgpack.

Replaces the reference's source-embedding pickle scheme
(torch_utils/persistence.py:27-80): instead of pickling live modules with
their code, a checkpoint is data only — the architecture config (JSON,
versioned by the GANformerConfig schema) plus the flax variable pytree
(msgpack via flax.serialization). Safe to load (no code execution), portable,
and exactly reproducible from `Generator(cfg)` + the stored params.

Reference .pkl checkpoints are converted once with
tools/convert_checkpoint.py (torch-CPU reader), mirroring loader.py's
{G, D, Gs} layout.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
from flax import serialization

from morphganformer_tpu.models.config import DiscriminatorConfig, GANformerConfig

ARCH_FILE = "arch.json"
PARAMS_FILE = "{role}.msgpack"


def save_generator(path: str, cfg: GANformerConfig, variables,
                   role: str = "Gs") -> None:
    """Write arch.json + <role>.msgpack under directory `path`."""
    os.makedirs(path, exist_ok=True)
    arch_path = os.path.join(path, ARCH_FILE)
    arch = {}
    if os.path.exists(arch_path):
        with open(arch_path) as f:
            arch = json.load(f)
    arch[role] = json.loads(cfg.to_json())
    with open(arch_path, "w") as f:
        json.dump(arch, f, indent=2)
    variables = jax.device_get(variables)
    with open(os.path.join(path, PARAMS_FILE.format(role=role)), "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_generator(path: str, role: str = "Gs"):
    """Return (cfg, model, variables) for the stored generator."""
    from morphganformer_tpu.models.generator import Generator, init_generator

    with open(os.path.join(path, ARCH_FILE)) as f:
        arch = json.load(f)
    if role not in arch:
        raise KeyError(f"role {role!r} not in checkpoint {path}; "
                       f"has {sorted(arch)}")
    cfg = GANformerConfig.from_json(json.dumps(arch[role]))
    model, template = init_generator(cfg, seed=0, batch=1)
    with open(os.path.join(path, PARAMS_FILE.format(role=role)), "rb") as f:
        variables = serialization.from_bytes(template, f.read())
    return cfg, model, variables


def save_discriminator(path: str, cfg: DiscriminatorConfig, variables) -> None:
    os.makedirs(path, exist_ok=True)
    arch_path = os.path.join(path, ARCH_FILE)
    arch = {}
    if os.path.exists(arch_path):
        with open(arch_path) as f:
            arch = json.load(f)
    arch["D"] = json.loads(cfg.to_json())
    with open(arch_path, "w") as f:
        json.dump(arch, f, indent=2)
    variables = jax.device_get(variables)
    with open(os.path.join(path, PARAMS_FILE.format(role="D")), "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_discriminator(path: str):
    import jax.numpy as jnp
    from morphganformer_tpu.models.discriminator import Discriminator

    with open(os.path.join(path, ARCH_FILE)) as f:
        arch = json.load(f)
    cfg = DiscriminatorConfig.from_json(json.dumps(arch["D"]))
    model = Discriminator(cfg)
    img = jnp.zeros((4, cfg.img_resolution, cfg.img_resolution,
                     cfg.img_channels))
    template = model.init(jax.random.PRNGKey(0), img)
    with open(os.path.join(path, PARAMS_FILE.format(role="D")), "rb") as f:
        variables = serialization.from_bytes(template, f.read())
    return cfg, model, variables


def load_network(path: str, role: str = "Gs"):
    """Load a generator from a native checkpoint dir, or (if `path` is a
    reference .pkl) instruct the user to convert it first
    (tools/convert_checkpoint.py mirrors loader.py:26-47)."""
    if path.endswith(".pkl"):
        raise ValueError(
            f"{path} is a torch/TF pickle. Convert it once with:\n"
            f"  python tools/convert_checkpoint.py {path} <out_dir>\n"
            f"then pass <out_dir>.")
    return load_generator(path, role=role)
