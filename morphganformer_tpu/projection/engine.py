"""Latent projection engine: optimize a latent so G(latent) matches a target.

Behavioral spec: the shared skeleton of the reference's 14 `1024_example_*.py`
+ 7 `projection_example_*.py` scripts (e.g. 1024_example_MSE.py:113-175):
cosine-ramped LR (`get_lr` :62-67), decaying latent-noise injection
(:70-72,134-135), Adam(weight_decay=1e-4) over a latent initialized at the
mean of n_mean_latent z-samples (:113-117,211-215), best-loss tracking with
checkpointed samples (:155-164), and `latent_path[-1]` as the result.

Critical redesign (the stated north star, SURVEY.md §2.6): the reference
severs the autograd graph every step (`G(latent)[0].cpu().detach()` then
`loss.requires_grad = True`), so gradients never reach the latent and
"optimization" is a noisy random search. Here the whole step is one jitted
`value_and_grad` through the generator and the loss stack, scanned on device
— true gradient descent, hundreds of times faster and actually convergent.

Hyperparameters and output conventions (lr 0.1, rampup 0.05, rampdown 0.25,
noise 0.05, noise_ramp 0.75, psi 0.7, `sample_{step}_{loss}.png` naming,
`.mat` latents) are preserved.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class ProjectionConfig:
    """Defaults mirror 1024_example_MSE.py:185-205."""
    steps: int = 5000
    lr: float = 0.1
    lr_rampup: float = 0.05
    lr_rampdown: float = 0.25
    noise: float = 0.05
    noise_ramp: float = 0.75
    truncation_psi: float = 0.7
    weight_decay: float = 1e-4
    n_mean_latent: int = 10000
    # Noise-window size AND, when a progress callback is passed, the scan
    # length per host round-trip. Without a callback the whole run is one
    # scan call, but the per-step noise sequence is identical either way
    # (noise keys are split per chunk-sized window, not per scan call).
    chunk: int = 250
    w_plus: bool = False      # optimize full [k, num_ws, w_dim] instead of z
    # > 0 enables JOINT optimization of the per-layer const-noise buffers
    # with the latent, weighted multi-scale autocorrelation penalty plus
    # per-step noise re-normalization. The reference PARSES this flag but
    # never calls its noise_regularize()/noise_normalize_() functions
    # (1024_example_MSE.py:31-59,203 — dead code from the StyleGAN2
    # projector); here the flag does what that code was written for.
    # Batch-1 only (noise maps are shared across the batch).
    noise_regularize: float = 0.0


def cosine_ramp_lr(t, initial_lr, rampdown=0.25, rampup=0.05):
    """Reference get_lr (1024_example_MSE.py:62-67), jit-safe."""
    ramp = jnp.minimum(1.0, (1.0 - t) / rampdown)
    ramp = 0.5 - 0.5 * jnp.cos(ramp * math.pi)
    ramp = ramp * jnp.minimum(1.0, t / rampup)
    return initial_lr * ramp


def split_noise_buffers(variables):
    """The const-noise buffer subtree as a flat {'scope/.../noise_const':
    [H, W]} dict — the optimizable noise maps of cfg.noise_regularize."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables.get("buffers", {}))
    return {"/".join(p): v for p, v in flat.items() if p[-1] == "noise_const"}


def merge_noise_buffers(variables, noises):
    """Reinsert optimized noise maps into a variables pytree."""
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(variables["buffers"]))
    for key, v in noises.items():
        flat[tuple(key.split("/"))] = v
    return {**variables, "buffers": traverse_util.unflatten_dict(flat)}


def noise_regularize_loss(noises):
    """Multi-scale noise autocorrelation penalty — the reference's unused
    noise_regularize() (1024_example_MSE.py:31-51), executed-golden-tested:
    at each pyramid level, squared mean of the product with the 1-pixel
    roll along each spatial axis; 2x2-mean downsample while size > 8."""
    total = jnp.zeros((), jnp.float32)
    for n in noises.values():
        n = n.astype(jnp.float32)
        size = n.shape[-1]
        while True:
            total = (total
                     + jnp.mean(n * jnp.roll(n, 1, axis=-1)) ** 2
                     + jnp.mean(n * jnp.roll(n, 1, axis=-2)) ** 2)
            if size <= 8:
                break
            h, w = n.shape[-2], n.shape[-1]
            n = n.reshape(*n.shape[:-2], h // 2, 2, w // 2, 2).mean(axis=(-3, -1))
            size //= 2
    return total


def normalize_noises(noises):
    """Zero-mean / unit-std per noise map — the reference's unused
    noise_normalize_ (1024_example_MSE.py:54-59); eps guards the all-equal
    map (normalization is a no-op there anyway after the first step)."""
    return {k: (n - jnp.mean(n)) / (jnp.std(n) + 1e-8)
            for k, n in noises.items()}


def latent_stats(model, variables, cfg_model, rng, n_mean_latent=10000,
                 batch=2048):
    """Mean/std of the z prior (reference 1024_example_MSE.py:211-215).
    std is the reference's global scalar: sqrt(sum((z - mean)^2) / n).
    Streaming 2-accumulator form — sum(z) [k,z_dim] and sum(z^2) scalar —
    so memory is O(k*z_dim), not O(n_mean_latent):
    sum((z - mean)^2) = sum(z^2) - n * sum(mean^2)."""
    k, z_dim = cfg_model.k, cfg_model.z_dim
    total = jnp.zeros((k, z_dim))
    total_sq = jnp.zeros(())
    n_done = 0
    while n_done < n_mean_latent:
        b = min(batch, n_mean_latent - n_done)
        rng, sub = jax.random.split(rng)
        z = jax.random.normal(sub, (b, k, z_dim))
        total = total + jnp.sum(z, axis=0)
        total_sq = total_sq + jnp.sum(jnp.square(z))
        n_done += b
    mean = total / n_mean_latent
    sq = total_sq - n_mean_latent * jnp.sum(jnp.square(mean))
    std = jnp.sqrt(sq / n_mean_latent)
    return mean, std


@dataclasses.dataclass
class ProjectionResult:
    latent: jnp.ndarray          # best latents [B, k, z_dim] (or ws)
    best_img: jnp.ndarray        # G(best latents), NHWC in [-1,1]
    best_loss: float             # mean of per-image bests
    best_step: int               # last step at which any image improved
    loss_history: jnp.ndarray    # [steps] per-step mean loss
    components_history: Dict[str, jnp.ndarray]
    per_image_loss: jnp.ndarray = None  # [B] per-image best losses
    per_image_step: jnp.ndarray = None  # [B] step at which each best occurred
    noises: Optional[Dict] = None       # best noise maps (noise_regularize)


def _make_opt(cfg: ProjectionConfig):
    """Adam with torch-style (coupled) weight decay
    (1024_example_MSE.py:117: Adam([latent], lr, weight_decay=1e-4))."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-1.0),  # lr applied manually per step (cosine ramp)
    )


def make_projection_step(model, variables, loss_fn, cfg: ProjectionConfig,
                         latent_std, target, w_plus=None):
    """Build the scan body. `loss_fn(img, target) -> (scalar, dict)`.

    With cfg.noise_regularize > 0 the optimized variable is the pytree
    {'latent': ..., 'noises': {...}} (see ProjectionConfig) and the carry's
    latent/best-latent slots hold that tree; otherwise the plain latent
    array — the disabled path traces EXACTLY the round-2 HLO (the committed
    bench compile cache must keep covering it)."""
    w_plus = cfg.w_plus if w_plus is None else w_plus
    opt = _make_opt(cfg)
    opt_noise = cfg.noise_regularize > 0.0

    def synth(latent, noises=None):
        vars_ = variables if noises is None else \
            merge_noise_buffers(variables, noises)
        if w_plus:
            img, _ = model.apply(vars_, latent, noise_mode="const",
                                 method=type(model).run_synthesis)
        else:
            img = model.apply(vars_, latent,
                              truncation_psi=cfg.truncation_psi,
                              noise_mode="const")
        return img

    def step_fn(carry, step_in):
        # step_in: (step_idx, unit-normal noise) — noise is pre-generated per
        # chunk outside the scan (cheaper than per-step threefry inside).
        # The carry deliberately holds NO image-sized tensors: the best image
        # is regenerated from the best (noised) latent after the loop, which
        # is exact under noise_mode="const" — keeping the carry small avoids
        # a full-image where() per step and, on remote-dispatch backends,
        # a multi-MB output transfer per chunk call.
        step_idx, noise_unit = step_in
        (params, opt_state, best_loss, best_params, best_step, rng) = carry
        latent = params["latent"] if opt_noise else params
        t = step_idx.astype(jnp.float32) / cfg.steps
        lr = cosine_ramp_lr(t, cfg.lr, cfg.lr_rampdown, cfg.lr_rampup)
        noise_strength = latent_std * cfg.noise * \
            jnp.maximum(0.0, 1.0 - t / cfg.noise_ramp) ** 2
        latent_n = latent + noise_unit * noise_strength

        def total_loss(p_n):
            if opt_noise:
                img = synth(p_n["latent"], p_n["noises"])
            else:
                img = synth(p_n)
            # Per-image losses (vmap each term over the batch) so batched
            # projections (e.g. the morph pair) track bests independently.
            per_img, comps = jax.vmap(
                lambda a, b: loss_fn(a[None], b[None]))(img, target)
            loss = jnp.mean(per_img)
            if opt_noise:
                loss = loss + cfg.noise_regularize * \
                    noise_regularize_loss(p_n["noises"])
            return loss, (per_img, comps)

        p_n = {"latent": latent_n, "noises": params["noises"]} if opt_noise \
            else latent_n
        (loss, (per_img, comps)), grads = jax.value_and_grad(
            total_loss, has_aux=True)(p_n)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + lr * u,
                                        params, updates)
        if opt_noise:
            params = {"latent": params["latent"],
                      "noises": normalize_noises(params["noises"])}

        improved = per_img < best_loss                               # [B]
        best_loss = jnp.where(improved, per_img, best_loss)
        expand = (slice(None),) + (None,) * (latent.ndim - 1)
        if opt_noise:
            # Noise maps are batch-shared (project() enforces batch 1), so
            # their best tracks under any-improved.
            best_params = {
                "latent": jnp.where(improved[expand], latent_n,
                                    best_params["latent"]),
                "noises": jax.tree_util.tree_map(
                    lambda n, b: jnp.where(jnp.any(improved), n, b),
                    p_n["noises"], best_params["noises"]),
            }
        else:
            best_params = jnp.where(improved[expand], latent_n, best_params)
        # Track the step at which each image's best occurred under the SAME
        # predicate as the latent (ADVICE r1: argmin over chunk means
        # could disagree with the returned latent).
        best_step = jnp.where(improved, step_idx, best_step)
        new_carry = (params, opt_state, best_loss, best_params, best_step, rng)
        return new_carry, (loss, comps)

    return opt, step_fn


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _run_chunk_jit(model, loss_fn, cfg, variables, target, latent_std,
                   carry, steps_slice, noise_seq):
    _, step_fn = make_projection_step(model, variables, loss_fn, cfg,
                                      latent_std, target)
    return jax.lax.scan(step_fn, carry, (steps_slice, noise_seq))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _synth_jit(model, cfg, variables, latent):
    """G(latent) with the projection's synthesis mode (z or W+)."""
    if cfg.w_plus:
        img, _ = model.apply(variables, latent, noise_mode="const",
                             method=type(model).run_synthesis)
        return img
    return model.apply(variables, latent, truncation_psi=cfg.truncation_psi,
                       noise_mode="const")


def project(model, variables, target, loss_fn, cfg: ProjectionConfig,
            latent_mean, latent_std, rng=None,
            progress: Optional[Callable[[int, float, float], None]] = None,
            init_latent=None, mesh=None) -> ProjectionResult:
    """Run the full projection. target: [1,H,W,3] NHWC in [-1,1].

    In W+ mode (cfg.w_plus) the optimized variable is the full per-layer
    latent ws [B, k, num_ws, w_dim]; a z-shaped init (the prior mean or a
    stored z latent) is pushed through the mapping network with the
    configured truncation first. The latent-noise scale stays the z-prior
    std in both modes (the reference scripts only implement z-space,
    1024_example_MSE.py:134-135).

    `mesh`: optional jax.sharding.Mesh with a 'data' axis. The batch of
    the projection scan (targets, latents, optimizer moments, per-image
    best trackers — all per-row independent) is sharded over it with the
    generator weights replicated, so the batch-2P morph scan scales
    near-linearly over a pod slice (the DP model of
    run_network.py:394-402 generalized to the morph product). Requires
    batch %% n_devices == 0; equivalence vs single-device is pinned by
    tests/test_parallel.py."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k, z_dim = latent_mean.shape
    if init_latent is not None:
        latent = jnp.asarray(init_latent)
        is_z = latent.shape[-2:] == (k, z_dim)   # z vs stored W+ latent
        if latent.ndim == (2 if is_z else 3):    # add batch dim
            latent = latent[None]
    else:
        latent = jnp.tile(latent_mean[None], (target.shape[0], 1, 1))
        is_z = True
    if cfg.w_plus and is_z:
        # z -> ws through mapping (+ truncation), then optimize ws directly.
        latent = model.apply(variables, latent,
                             truncation_psi=cfg.truncation_psi,
                             skip_w_avg_update=True,
                             method=type(model).run_mapping)
    if latent.shape[0] != target.shape[0]:
        latent = jnp.tile(latent, (target.shape[0],) + (1,) * (latent.ndim - 1))

    opt_noise = cfg.noise_regularize > 0.0
    if opt_noise:
        assert target.shape[0] == 1, \
            "noise_regularize optimizes batch-shared noise maps (batch 1 only)"
        params0 = {"latent": latent,
                   "noises": split_noise_buffers(variables)}
        assert params0["noises"], "model has no const-noise buffers"
    else:
        params0 = latent
    opt_state = _make_opt(cfg).init(params0)

    # Per-image best trackers (reference inits min_loss=1.0; use +inf-ish so
    # the tracker always captures something).
    big = jnp.full((target.shape[0],), 1e30, jnp.float32)
    steps0 = jnp.zeros((target.shape[0],), jnp.int32)
    carry = (params0, opt_state, big, params0, steps0, rng)

    shard_noise = None
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        ndev = int(np.prod(mesh.devices.shape))
        batch = target.shape[0]
        assert not opt_noise, \
            "noise_regularize is batch-1; sharding needs a batch"
        assert batch % ndev == 0, \
            f"projection batch {batch} must divide the mesh ({ndev} devices)"
        dsh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())

        def put_batch(tree):
            # Batch-leading leaves shard over 'data'; scalars (the adam
            # count) replicate. The rng key is placed separately (its
            # leading dim is 2, which can collide with batch == 2).
            return jax.tree_util.tree_map(
                lambda l: jax.device_put(
                    l, dsh if getattr(l, "ndim", 0) >= 1
                    and l.shape[0] == batch else rep), tree)

        variables = jax.device_put(variables, rep)
        target = jax.device_put(target, dsh)
        carry = (*put_batch(carry[:5]), jax.device_put(rng, rep))
        nsh = NamedSharding(mesh, P(None, "data"))
        shard_noise = lambda ns: jax.device_put(ns, nsh)

    def run_chunk(carry, steps_slice, noise_seq):
        # Module-level jitted runner: static args are hashable (frozen
        # dataclasses / callables by identity), traced args carry the data —
        # so repeated project() calls with the same model/config reuse the
        # compiled scan instead of re-jitting fresh closures every call.
        return _run_chunk_jit(model, loss_fn, cfg, variables, target,
                              latent_std, carry, steps_slice, noise_seq)

    losses, comps_hist = [], []
    # Per-step noise is derived per cfg.chunk-sized WINDOW regardless of how
    # execution is chunked (ADVICE r2: progress vs non-progress runs of the
    # same config/seed must produce identical latents) — the execution chunk
    # below only affects host sync cadence, never the noise sequence.
    n_windows = max(1, math.ceil(cfg.steps / cfg.chunk))
    rng, *win_keys = jax.random.split(rng, n_windows + 1)

    def noise_for(lo, hi):
        parts = []
        for wi in range(lo // cfg.chunk, math.ceil(hi / cfg.chunk)):
            wlo = wi * cfg.chunk
            whi = min(cfg.steps, wlo + cfg.chunk)
            part = jax.random.normal(win_keys[wi], (whi - wlo, *latent.shape))
            parts.append(part[max(0, lo - wlo):hi - wlo])
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    # Without a progress callback there is no reason to come back to the
    # host between chunks — run the whole thing as one scan call.
    chunk = cfg.chunk if progress is not None else cfg.steps
    n_chunks = max(1, math.ceil(cfg.steps / chunk))
    for ci in range(n_chunks):
        lo = ci * chunk
        hi = min(cfg.steps, lo + chunk)
        if hi <= lo:
            break
        idx = jnp.arange(lo, hi)
        noise_seq = noise_for(lo, hi)
        if shard_noise is not None:
            noise_seq = shard_noise(noise_seq)
        carry, (chunk_losses, chunk_comps) = run_chunk(carry, idx, noise_seq)
        losses.append(chunk_losses)
        comps_hist.append(chunk_comps)
        if progress is not None:
            cur_best = float(jnp.mean(carry[2]))  # forces device sync
            progress(hi, float(chunk_losses[-1]), cur_best)

    _, _, best_loss, best_params, best_steps, _ = carry
    if opt_noise:
        best_latent, best_noises = best_params["latent"], best_params["noises"]
        synth_vars = merge_noise_buffers(variables, best_noises)
    else:
        best_latent, best_noises = best_params, None
        synth_vars = variables
    # Regenerate the best image from the saved (noised) best latent (+ best
    # noise maps) — exact under noise_mode="const", and cheaper than carrying
    # images in the scan.
    best_img = _synth_jit(model, cfg, synth_vars, best_latent)
    comps = {k: jnp.concatenate([c[k] for c in comps_hist])
             for k in comps_hist[0]} if comps_hist else {}
    return ProjectionResult(
        latent=best_latent,
        noises=best_noises,
        best_img=best_img,
        best_loss=float(jnp.mean(best_loss)),
        best_step=int(jnp.max(best_steps)),
        loss_history=jnp.concatenate(losses),
        components_history=comps,
        per_image_loss=best_loss,
        per_image_step=best_steps,
    )
