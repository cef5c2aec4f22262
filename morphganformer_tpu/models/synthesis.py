"""Synthesis network: intermediate latents w_1..w_k -> image.

Behavioral spec: SynthesisLayer/ToRGBLayer/SynthesisBlock/SynthesisNetwork in
the reference training/networks.py (:945-1264), including:
  * global latent drives conv styles via the per-layer affine (:1022),
  * local components modulate pixels through duplex attention (:1026-1034),
  * per-layer noise after attention (:1036-1037),
  * skip/resnet/orig block architectures (:1132-1174),
  * the TF-compat `conv_last` on the final block (:1124-1130),
  * w-slice bookkeeping where each torgb shares the first w of the next
    block (:1244-1253).

TPU-first: NHWC activations, optional bfloat16 compute inside blocks with
float32 RGB accumulation, attention-map export gated behind `return_att`
(the reference always materializes upsampled attention maps — a huge HBM cost
at 1024^2 we only pay when asked).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from morphganformer_tpu.models.config import GANformerConfig
from morphganformer_tpu.models.layers import (
    BiasAct,
    Conv2dLayer,
    FullyConnected,
    GridPositionalEncoding,
    get_components,
    get_gain,
    get_global,
    runtime_coef,
    weight_init,
)
from morphganformer_tpu.models.transformer import TransformerLayer
from morphganformer_tpu.ops import (
    modulated_conv2d,
    nearest_neighbors_kernel,
    setup_filter,
    upsample2d,
)


def packed_block_eligible(cfg: GANformerConfig, res: int,
                          noise_mode: str) -> bool:
    """Gate for the lane-packed high-resolution block pipeline.

    When a block qualifies, ALL its ops (skip 1x1-up, conv0 up2, conv1,
    conv_last) run as packed pallas kernels exchanging [B, H, G, 128]
    tensors, so no narrow-lane (C<128) activation exists at that
    resolution — the layout-relayout copies XLA otherwise inserts around
    high-res NHWC C=32/64 tensors (see ops/pallas_conv.py module docstring)
    disappear. MGT_PACKED_SYNTH=0 disables."""
    import os

    from morphganformer_tpu.ops.packed_override import packed_paths_disabled

    if packed_paths_disabled():
        return False   # second-order autodiff context (PL reg)
    if os.environ.get("MGT_PACKED_SYNTH", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    return packed_structural_ok(cfg, res, noise_mode)


def packed_structural_ok(cfg: GANformerConfig, res: int,
                         noise_mode: str) -> bool:
    """Structural part of the packed gate (no env/backend checks) — the
    SINGLE definition of which blocks/noise modes the packed kernels
    support. Parity tests force the packed path through this predicate so
    the tested gate cannot drift from production (ADVICE r2: a test-local
    copy that omitted 'random' made the random-noise parity test vacuous)."""
    in_ch = cfg.channels(res // 2)
    out_ch = cfg.channels(res)
    g = (res // 2) * in_ch // 128
    base = (cfg.architecture == "resnet" and cfg.style
            and cfg.act == "lrelu" and res > 4
            and not cfg.use_attention(res)
            and noise_mode in ("const", "none", "random"))
    lane_ok = (in_ch <= 128 and 128 % in_ch == 0
               and out_ch * 2 == in_ch
               and (res // 2) * in_ch % 128 == 0
               and g % 8 == 0)
    # b256 wide-lane: Cin = 256 runs as one native 256-lane launch
    # (ops/pallas_conv.py fused_packed_upconv2_c256); needs
    # G = res//2 groups, 8-aligned. MGT_PACKED_B256=0 excludes the block
    # from the packed chain for A/B (its input pixel NHWC is identical to
    # the packed entry form, so the chain then simply starts at b512).
    import os
    split_ok = (in_ch == 256 and out_ch == 128 and (res // 2) % 8 == 0
                and os.environ.get("MGT_PACKED_B256", "1") != "0")
    return base and (lane_ok or split_ok)


class SynthesisLayer(nn.Module):
    """Modulated conv + optional duplex attention + noise + bias/act
    (reference SynthesisLayer, networks.py:945-1042)."""
    cfg: GANformerConfig
    in_channels: int
    out_channels: int
    out_res: int
    kernel_size: int = 3
    up: int = 1
    use_bias: bool = True
    gain: float = 1.0
    use_transformer: bool = False
    local_noise: bool = True
    packed: bool = False    # lane-packed [B, H, G, 128] in/out (TPU pipeline)

    @nn.compact
    def __call__(self, x, y, att_vars=None, pos=None, mask=None,
                 noise_mode="random", train: bool = False, resid=None):
        """`resid` (or None): a skip-branch tensor shaped like this layer's
        output, added after the activation — the resnet block's former
        explicit `y_skip + x`. On the fused same-res pallas path the add
        happens in-kernel (one output-res read+write pass cheaper); every
        other path falls back to an explicit add before returning."""
        cfg = self.cfg
        assert noise_mode in ("random", "const", "none")
        k = self.kernel_size
        in_res = self.out_res // self.up
        if self.packed and self.in_channels > 128:
            # Wide-lane packed block (b256): input stays pixel NHWC — the
            # P=1 packed form at 256 lanes.
            assert x.shape[1:] == (in_res, in_res, self.in_channels), \
                f"expected [B,{in_res},{in_res},{self.in_channels}], got {x.shape}"
        elif self.packed:
            g_groups = in_res * self.in_channels // 128
            assert x.shape[1:] == (in_res, g_groups, 128), \
                f"expected packed [B,{in_res},{g_groups},128], got {x.shape}"
        else:
            assert x.shape[1:] == (in_res, in_res, self.in_channels), \
                f"expected [B,{in_res},{in_res},{self.in_channels}], got {x.shape}"

        styles = FullyConnected(self.in_channels, bias_init=1.0, name="affine")(
            get_global(y).astype(jnp.float32))

        w = self.param("weight", weight_init(1.0),
                       (k, k, self.in_channels, self.out_channels))
        w_gain = runtime_coef(self.in_channels * k * k)
        f = setup_filter(list(cfg.resample_kernel))

        # Fused pallas paths: style scale, conv (optionally 2x-upsampling
        # with the FIR composed in), demod, noise, bias and lrelu in one
        # VMEM-resident pass (transformer-free high-res layers — see
        # ops/pallas_conv.py). In packed mode input/output stay in the
        # lane-packed [B, H, G, 128] representation.
        from morphganformer_tpu.ops.pallas_conv import (
            fused_modconv3x3_lrelu, fused_packed_upconv2,
            fused_packed_upconv2_c256)
        if self.packed:
            from morphganformer_tpu.ops.bias_act import activation_funcs

            noise = None
            if self.local_noise and noise_mode == "const":
                strength = self.param("noise_strength",
                                      nn.initializers.zeros, ())
                const = self.variable(
                    "buffers", "noise_const",
                    lambda: jax.random.normal(
                        jax.random.PRNGKey(self.out_res * 4 + self.up),
                        (self.out_res, self.out_res)))
                noise = const.value * strength                   # [H, W]
            elif self.local_noise and noise_mode == "random":
                # Training path: per-sample noise [N, H, W]. Drawn with the
                # same key/shape as the unfused branch (then squeezed) so
                # the two paths see identical values.
                strength = self.param("noise_strength",
                                      nn.initializers.zeros, ())
                noise = jax.random.normal(
                    self.make_rng("noise"),
                    (x.shape[0], self.out_res, self.out_res, 1))[..., 0]
                noise = noise * strength

            if self.use_bias:
                # Same BiasAct module/param path as the unfused branch.
                b = BiasAct(self.out_channels, act=cfg.act, gain=self.gain,
                            name="biasAct")(None, return_bias=True)
                alpha = 0.2
                act_gain = float(activation_funcs[cfg.act].def_gain
                                 * self.gain)
            else:
                b = None
                alpha = 1.0
                act_gain = 1.0
            w_full = (w * w_gain).astype(jnp.float32)
            if self.up == 2 and self.in_channels > 128:
                x = fused_packed_upconv2_c256(x, w_full, styles, f, noise, b,
                                              act_gain, alpha, True, False)
                if resid is not None:
                    x = x + resid.astype(x.dtype)
            elif self.up == 2:
                x = fused_packed_upconv2(x, w_full, styles, f, noise, b,
                                         act_gain, alpha, True, False)
                if resid is not None:
                    x = x + resid.astype(x.dtype)
            else:
                x = fused_modconv3x3_lrelu(x, w_full, styles, noise, b,
                                           resid, act_gain, alpha, True, True)
            return x, None, att_vars

        x = modulated_conv2d(
            x, (w * w_gain).astype(x.dtype), styles=styles, modulate=cfg.style,
            up=self.up, padding=k // 2, resample_kernel=f,
            flip_weight=(self.up == 1),
        )

        att_map = None
        if self.use_transformer:
            att = cfg.attention
            pos_dim = att.pos_dim or cfg.w_dim
            grid_pos = GridPositionalEncoding(
                res=self.out_res, pos_dim=pos_dim, pos_type=att.pos_type,
                pos_init=att.pos_init,
                pos_directions_num=att.pos_directions_num, name="grid_pos")()
            b, h, wdt, c = x.shape
            tokens = x.reshape(b, h * wdt, c)
            transformer = TransformerLayer(
                dim=self.out_channels, pos_dim=pos_dim,
                from_len=self.out_res * self.out_res, to_len=cfg.k - 1,
                from_dim=self.out_channels, to_dim=cfg.w_dim,
                from_gate=att.img_gate, to_gate=att.ltnt_gate,
                num_heads=att.num_heads, attention_dropout=att.dropout,
                integration=att.integration, norm=att.norm,
                kmeans=att.kmeans, kmeans_iters=att.kmeans_iters,
                iterative=att.iterative, name="transformer",
            )
            tokens, att_map, att_vars = transformer(
                tokens, get_components(y).astype(tokens.dtype),
                from_pos=grid_pos,
                to_pos=pos if (cfg.mapping.use_pos and pos is not None) else None,
                att_vars=att_vars, att_mask=mask, train=train,
            )
            x = tokens.reshape(b, h, wdt, c)

        if self.local_noise and noise_mode != "none":
            strength = self.param("noise_strength", nn.initializers.zeros, ())
            if noise_mode == "random":
                noise = jax.random.normal(
                    self.make_rng("noise"), (x.shape[0], self.out_res, self.out_res, 1))
            else:
                const = self.variable(
                    "buffers", "noise_const",
                    lambda: jax.random.normal(
                        jax.random.PRNGKey(self.out_res * 4 + self.up),
                        (self.out_res, self.out_res)))
                noise = const.value[None, :, :, None]
            x = x + (noise * strength).astype(x.dtype)

        if self.use_bias:
            x = BiasAct(self.out_channels, act=cfg.act, gain=self.gain,
                        name="biasAct")(x)
        if resid is not None:
            x = x + resid.astype(x.dtype)
        return x, att_map, att_vars


class ToRGBLayer(nn.Module):
    """1x1 modulated conv (no demod) to RGB (reference ToRGBLayer,
    networks.py:1046-1065, incl. the styles*w_gain TF-compat quirk).

    In packed mode the 1x1 conv is a single [*, 128] x [128, P*3]
    block-diagonal matmul on the lane-packed input, returning packed RGB
    [B, H, G, P*3] — keeping the whole high-res tail free of narrow-lane
    tensors (a pixel-space 3-channel conv at 1024^2 costs ~2 ms in XLA's
    narrow conv layout plus relayout copies)."""
    cfg: GANformerConfig
    in_channels: int
    out_channels: int
    kernel_size: int = 1
    packed: bool = False

    @nn.compact
    def __call__(self, x, y):
        cfg = self.cfg
        k = self.kernel_size
        styles = FullyConnected(self.in_channels, bias_init=1.0, name="affine")(
            get_global(y).astype(jnp.float32))
        w = self.param("weight", weight_init(1.0),
                       (k, k, self.in_channels, self.out_channels))
        w_gain = runtime_coef(self.in_channels * k * k)
        if cfg.style:
            styles = styles * w_gain
        else:
            w = w * w_gain
        if self.packed:
            assert k == 1 and cfg.style
            pack = 128 // self.in_channels
            s_p = jnp.tile(styles.astype(x.dtype), (1, pack))
            blocks = [w[0, 0].astype(x.dtype)] * pack
            e = jax.scipy.linalg.block_diag(*blocks)        # [128, P*out]
            out = jnp.einsum("nhgl,lm->nhgm", x * s_p[:, None, None, :], e)
            b = BiasAct(self.out_channels, name="biasAct")(
                None, return_bias=True)
            out = out + jnp.tile(b, pack).astype(out.dtype)
            return out.astype(jnp.float32)
        x = modulated_conv2d(x, w.astype(x.dtype), styles=styles,
                             modulate=cfg.style, demodulate=False)
        x = BiasAct(self.out_channels, name="biasAct")(x)
        return x.astype(jnp.float32)


class SynthesisBlock(nn.Module):
    """Stem/conv0/conv1(/conv_last) + RGB accumulation
    (reference SynthesisBlock, networks.py:1070-1174)."""
    cfg: GANformerConfig
    res: int

    @nn.compact
    def __call__(self, x, img, ws, att_vars, pos=None, mask=None,
                 noise_mode="random", train: bool = False,
                 packed: bool = False, packed_in: bool = False):
        cfg = self.cfg
        res = self.res
        arch = cfg.architecture
        is_last = res == cfg.img_resolution
        stem = res == 4
        out_channels = cfg.channels(res)
        in_channels = cfg.channels(res // 2) if not stem else 0
        use_tr = cfg.use_attention(res)
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

        n_w = cfg.block_num_conv(res) + cfg.block_num_torgb(res)
        assert ws.shape[1:] == (cfg.k, n_w, cfg.w_dim)
        w_i = iter(range(n_w))

        batch = ws.shape[0]
        att_maps = []

        if stem:
            if cfg.latent_stem:
                h = FullyConnected(out_channels * res * res, act=cfg.act,
                                   gain=math.sqrt(2) / 4, name="conv_stem")(
                    get_global(ws[:, :, next(w_i)]))
                x = h.reshape(batch, res, res, out_channels)
            else:
                const = self.param("const", nn.initializers.normal(stddev=1.0),
                                   (res, res, out_channels))
                x = jnp.tile(const[None], (batch, 1, 1, 1))
        elif (packed or packed_in) and in_channels > 128:
            # Channel-split packed block (b256): the input stays pixel NHWC
            # [B, res/2, res/2, 256]; conv0/skip slice 128-lane halves.
            assert x.shape[1:] == (res // 2, res // 2, in_channels)
        elif packed or packed_in:
            g_in = (res // 2) * in_channels // 128
            if packed and not packed_in:
                # Enter the packed domain (a pure reshape; for the flagship
                # the entry block's input is [*, 256, 256, 128], making this
                # the identity).
                x = x.reshape(batch, res // 2, g_in, 128)
            assert x.shape[1:] == (res // 2, g_in, 128)
        else:
            assert x.shape[1:] == (res // 2, res // 2, in_channels)
        x = x.astype(dtype)

        def conv(name, idx, in_ch, up, gain, resid=None):
            layer = SynthesisLayer(
                cfg=cfg, in_channels=in_ch, out_channels=out_channels,
                out_res=res, up=up, gain=gain, use_transformer=use_tr,
                local_noise=cfg.local_noise, packed=packed, name=name)
            return layer(x, ws[:, :, idx], att_vars=att_vars, pos=pos, mask=mask,
                         noise_mode=noise_mode, train=train, resid=resid)

        if stem:
            x, am, att_vars = conv("conv1", next(w_i), out_channels, 1, 1.0)
            att_maps.append(am)
        elif arch == "resnet":
            skip_mod = Conv2dLayer(in_channels, out_channels, 1,
                                   use_bias=False, up=2,
                                   resample_kernel=cfg.resample_kernel,
                                   gain=get_gain(arch), packed=packed,
                                   name="skip")
            y_skip = skip_mod(x)
            x, am, att_vars = conv("conv0", next(w_i), in_channels, 2, 1.0)
            att_maps.append(am)
            # The skip-branch add rides conv1's fused epilogue when conv1
            # takes the pallas path (explicit add otherwise) — see
            # SynthesisLayer's `resid`.
            x, am, att_vars = conv("conv1", next(w_i), out_channels, 1,
                                   get_gain(arch), resid=y_skip)
            att_maps.append(am)
        else:
            x, am, att_vars = conv("conv0", next(w_i), in_channels, 2, 1.0)
            att_maps.append(am)
            x, am, att_vars = conv("conv1", next(w_i), out_channels, 1, get_gain(arch))
            att_maps.append(am)

        if img is not None:
            f = setup_filter(list(cfg.resample_kernel))
            img = upsample2d(img, f)
        if is_last:
            # TF-compat extra layer: no transformer/bias/noise (networks.py:1124-1130).
            layer = SynthesisLayer(
                cfg=cfg, in_channels=out_channels, out_channels=out_channels,
                out_res=res, use_bias=False, use_transformer=False,
                local_noise=False, packed=packed, name="conv_last")
            x, _, _ = layer(x, ws[:, :, next(w_i)], noise_mode=noise_mode,
                            train=train)
        if is_last or arch == "skip":
            y = ToRGBLayer(cfg, out_channels, cfg.img_channels,
                           packed=packed, name="torgb")(
                x, ws[:, :, next(w_i)])
            if packed:
                # Packed RGB [B, H, G, P*3] -> pixel [B, H, W, 3]; the only
                # departure from the packed domain in the whole block.
                y = y.reshape(batch, res, res, cfg.img_channels)
            img = img + y if img is not None else y

        return x, img, att_maps, att_vars


class SynthesisNetwork(nn.Module):
    """Per-resolution block stack (reference SynthesisNetwork,
    networks.py:1186-1264)."""
    cfg: GANformerConfig

    def _att_maps_to_tensor(self, att_list, batch):
        """Stack per-layer attention maps into [B, k-1, L, heads, H, W]
        (reference list2tensor, networks.py:1222-1242)."""
        cfg = self.cfg
        att_list = [a for a in att_list if a is not None]
        if not att_list:
            return jnp.zeros([1])
        maps_out = []
        for att_map in att_list:  # [B, N, F, T]
            b, n, fl, t = att_map.shape
            s = int(round(fl ** 0.5))
            a = att_map.transpose(0, 1, 3, 2).reshape(b * n, t, s, s)
            a = a.transpose(0, 2, 3, 1)  # NHWC [BN, s, s, T]
            if s < cfg.img_resolution:
                factor = cfg.img_resolution // s
                a = upsample2d(a, nearest_neighbors_kernel(factor), up=factor)
            hh = cfg.img_resolution
            a = a.transpose(0, 3, 1, 2).reshape(b, n, t, hh, hh)
            maps_out.append(a)
        out = jnp.stack(maps_out, axis=1)           # [B, L, N, T, H, W]
        return out.transpose(0, 3, 1, 2, 4, 5)       # [B, T, L, N, H, W]

    @nn.compact
    def __call__(self, ws, pos=None, mask=None, noise_mode="random",
                 train: bool = False, return_att: bool = False):
        cfg = self.cfg
        assert ws.shape[1:] == (cfg.k, cfg.num_ws, cfg.w_dim), \
            f"ws must be [B,{cfg.k},{cfg.num_ws},{cfg.w_dim}], got {ws.shape}"
        ws = ws.astype(jnp.float32)

        x, img, att_maps = None, None, []
        att_vars = {"centroid_assignments": None}
        prev_packed = False
        for res, (start, count) in zip(cfg.block_resolutions, cfg.block_w_slices()):
            block = SynthesisBlock(cfg, res, name=f"b{res}")
            packed = packed_block_eligible(cfg, res, noise_mode)
            if prev_packed and not packed:
                # Previous block produced packed output but this one can't
                # consume it — unpack (pure reshape).
                c_prev = cfg.channels(res // 2)
                x = x.reshape(x.shape[0], res // 2, res // 2, c_prev)
            with jax.named_scope("split_ws"):
                cur_ws = jax.lax.slice_in_dim(ws, start, start + count, axis=2)
            with jax.named_scope(f"b{res}"):
                x, img, maps, att_vars = block(x, img, cur_ws, att_vars,
                                               pos=pos, mask=mask,
                                               noise_mode=noise_mode,
                                               train=train, packed=packed,
                                               packed_in=prev_packed and packed)
            prev_packed = packed and res != cfg.img_resolution
            att_maps += maps

        if return_att:
            return img, self._att_maps_to_tensor(att_maps, ws.shape[0])
        return img, None
