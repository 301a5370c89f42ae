"""Depth-Anything-V2-style monocular depth estimation (Flax).

The reference consumes precomputed ``dep/%08d.dmb`` maps (APD.cpp:1219-1223);
the Depth-Anything-V2 network itself is not part of the CUDA repo.  This
module provides the TPU-native inference path: a DINOv2-style ViT backbone
with a DPT (dense prediction transformer) head producing relative depth,
matched to DA-V2's architecture family so released checkpoints can be
converted into the parameter tree (see ``param_mapping`` docstring).

Compute-heavy matmuls run in bfloat16 on the MXU (explicit, the geometry
elsewhere needs f32); the output is float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class DAConfig:
    patch_size: int = 14
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (2, 5, 8, 11)
    dpt_features: int = 64
    dpt_out_channels: Tuple[int, ...] = (48, 96, 192, 384)

    @classmethod
    def vits(cls) -> "DAConfig":
        return cls()

    @classmethod
    def vitb(cls) -> "DAConfig":
        return cls(embed_dim=768, depth=12, num_heads=12,
                   out_indices=(2, 5, 8, 11), dpt_features=128,
                   dpt_out_channels=(96, 192, 384, 768))

    @classmethod
    def tiny_test(cls) -> "DAConfig":
        return cls(embed_dim=32, depth=2, num_heads=2, out_indices=(0, 0, 1, 1),
                   dpt_features=16, dpt_out_channels=(8, 8, 16, 16))


def _bicubic_resize(x, out_hw):
    """Non-antialiased bicubic resize, half-pixel convention (torch
    F.interpolate(mode="bicubic", align_corners=False, antialias=False) —
    what DINOv2 uses for pos-embed interpolation).  x [B, H, W, C]."""
    B, H, W, C = x.shape
    nh, nw = out_hw
    if (H, W) == (nh, nw):
        return x

    a = -0.75

    def axis_weights(n_in, n_out):
        src = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        i0 = jnp.floor(src).astype(jnp.int32)
        f = src - i0
        d = [f + 1.0, f, 1.0 - f, 2.0 - f]
        w = [a * d[0] ** 3 - 5 * a * d[0] ** 2 + 8 * a * d[0] - 4 * a,
             (a + 2) * d[1] ** 3 - (a + 3) * d[1] ** 2 + 1,
             (a + 2) * d[2] ** 3 - (a + 3) * d[2] ** 2 + 1,
             a * d[3] ** 3 - 5 * a * d[3] ** 2 + 8 * a * d[3] - 4 * a]
        idx = [jnp.clip(i0 + k - 1, 0, n_in - 1) for k in range(4)]
        return idx, w

    iy, wy = axis_weights(H, nh)
    ix, wx = axis_weights(W, nw)
    rows = sum(x[:, iy[k]] * wy[k][None, :, None, None] for k in range(4))
    return sum(rows[:, :, ix[k]] * wx[k][None, None, :, None]
               for k in range(4))


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        qkv = nn.Dense(3 * self.dim, dtype=jnp.bfloat16, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (C // self.num_heads) ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            jnp.bfloat16)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=jnp.bfloat16, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, name="attn")(h)
        ls1 = self.param("ls1", nn.initializers.constant(1e-5), (self.dim,))
        x = x + h * ls1
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Dense(hidden, dtype=jnp.bfloat16, name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=jnp.bfloat16, name="mlp_fc2")(h)
        ls2 = self.param("ls2", nn.initializers.constant(1e-5), (self.dim,))
        return x + h * ls2


class DinoViT(nn.Module):
    cfg: DAConfig

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        """x [B, H, W, 3] -> intermediate tokens [B, h*w, C] per out_index."""
        cfg = self.cfg
        B, H, W, _ = x.shape
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    dtype=jnp.bfloat16, name="patch_embed")(x)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(B, hh * ww, cfg.embed_dim)

        cls_tok = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.embed_dim))
        # learnable pos embedding for a 37x37 base grid, resized on the fly
        base = 37
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, base * base + 1, cfg.embed_dim))
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        pos_grid = pos_grid.reshape(1, base, base, cfg.embed_dim)
        pos_grid = _bicubic_resize(pos_grid.astype(jnp.float32), (hh, ww))
        pos_grid = pos_grid.reshape(1, hh * ww, cfg.embed_dim)
        x = x + pos_grid
        cls_t = jnp.tile(cls_tok + pos_cls, (B, 1, 1))
        x = jnp.concatenate([cls_t.astype(x.dtype), x], axis=1)

        outs = {}
        for i in range(cfg.depth):
            x = Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                      name=f"block{i}")(x)
            if i in cfg.out_indices:
                outs[i] = x
        # DA-V2 takes intermediate layers through the FINAL LayerNorm
        # (DINOv2 get_intermediate_layers(..., norm=True))
        final_norm = nn.LayerNorm(dtype=jnp.float32, name="norm")
        feats = []
        for i in cfg.out_indices:
            t = final_norm(outs.get(i, x))
            feats.append(t[:, 1:])           # drop CLS
        return feats, (hh, ww)


def _resize_ac(x, out_hw):
    """Bilinear resize with align_corners=True (torch F.interpolate
    semantics, which jax.image.resize's half-pixel convention does not
    match).  x [B, H, W, C] float."""
    B, H, W, C = x.shape
    nh, nw = out_hw
    if (H, W) == (nh, nw):
        return x
    ys = jnp.linspace(0.0, H - 1.0, nh)
    xs = jnp.linspace(0.0, W - 1.0, nw)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - fx) + g(y0, x1) * fx
    bot = g(y1, x0) * (1 - fx) + g(y1, x1) * fx
    return top * (1 - fy) + bot * fy


class ResidualConvUnit(nn.Module):
    """DA-V2 ResidualConvUnit: relu-conv-relu-conv + skip."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), dtype=jnp.bfloat16, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=jnp.bfloat16, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """DA-V2 FeatureFusionBlock: optional skip through resConfUnit1, then
    resConfUnit2, align-corners upsample, 1x1 out_conv."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        B, h, w, C = x.shape
        nh, nw = out_hw if out_hw is not None else (h * 2, w * 2)
        x = _resize_ac(x.astype(jnp.float32), (nh, nw)).astype(jnp.bfloat16)
        return nn.Conv(self.features, (1, 1), dtype=jnp.bfloat16,
                       name="out_conv")(x)


class DPTHead(nn.Module):
    """Mirror of DA-V2's DPTHead (projects + learned resize layers +
    scratch layer_rn convs + refinenet fusion + output convs) so released
    checkpoints convert 1:1 (see convert_torch_checkpoint)."""

    cfg: DAConfig

    @nn.compact
    def __call__(self, feats, grid_hw, out_hw):
        cfg = self.cfg
        hh, ww = grid_hw
        f = cfg.dpt_features
        levels = []
        for i, (tok, oc) in enumerate(zip(feats, cfg.dpt_out_channels)):
            B, N, C = tok.shape
            x = tok.reshape(B, hh, ww, C)
            x = nn.Conv(oc, (1, 1), dtype=jnp.bfloat16,
                        name=f"project{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(oc, (4, 4), strides=(4, 4),
                                     dtype=jnp.bfloat16, name="resize0")(x)
            elif i == 1:
                x = nn.ConvTranspose(oc, (2, 2), strides=(2, 2),
                                     dtype=jnp.bfloat16, name="resize1")(x)
            elif i == 3:
                # torch pads (1, 1); SAME would pad (0, 1) at stride 2
                x = nn.Conv(oc, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            dtype=jnp.bfloat16, name="resize3")(x)
            x = nn.Conv(f, (3, 3), dtype=jnp.bfloat16, use_bias=False,
                        name=f"layer{i + 1}_rn")(x)
            levels.append(x)

        l1, l2, l3, l4 = levels
        p4 = FeatureFusionBlock(f, name="refinenet4")(
            l4, out_hw=l3.shape[1:3])
        p3 = FeatureFusionBlock(f, name="refinenet3")(
            p4, l3, out_hw=l2.shape[1:3])
        p2 = FeatureFusionBlock(f, name="refinenet2")(
            p3, l2, out_hw=l1.shape[1:3])
        p1 = FeatureFusionBlock(f, name="refinenet1")(p2, l1)

        x = nn.Conv(f // 2, (3, 3), dtype=jnp.bfloat16,
                    name="output_conv1")(p1)
        x = _resize_ac(x.astype(jnp.float32),
                       (hh * cfg.patch_size, ww * cfg.patch_size))
        x = x.astype(jnp.bfloat16)
        x = nn.Conv(32, (3, 3), dtype=jnp.bfloat16, name="output_conv2a")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=jnp.bfloat16, name="output_conv2b")(x)
        x = nn.relu(x.astype(jnp.float32))[..., 0]
        return _resize_ac(x[..., None], out_hw)[..., 0]


class DepthAnythingV2(nn.Module):
    """Relative (inverse) depth network: [B, H, W, 3] in [0,1] -> [B, H, W]."""

    cfg: DAConfig

    @nn.compact
    def __call__(self, img):
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (img - mean) / std
        feats, grid_hw = DinoViT(self.cfg, name="backbone")(
            x.astype(jnp.bfloat16))
        return DPTHead(self.cfg, name="head")(feats, grid_hw,
                                              img.shape[1:3])


def pad_to_multiple(img: np.ndarray, multiple: int = 14) -> np.ndarray:
    H, W = img.shape[:2]
    ph = (-H) % multiple
    pw = (-W) % multiple
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2),
                     mode="edge")
    return img


def infer_relative_depth(params, img_gray: np.ndarray,
                         cfg: DAConfig = None) -> np.ndarray:
    """Run the network on a grayscale [H, W] 0..255 image -> [H, W] map
    scaled to 0..255 (the `dep/` convention the engine inverts)."""
    cfg = cfg or DAConfig.vits()
    model = DepthAnythingV2(cfg)
    H, W = img_gray.shape
    rgb = np.repeat(img_gray[..., None], 3, axis=-1).astype(np.float32) / 255.0
    rgb = pad_to_multiple(rgb, cfg.patch_size)
    out = model.apply({"params": params}, jnp.asarray(rgb[None]))
    out = np.asarray(out)[0, :H, :W]
    rng = out.max() - out.min()
    if rng < 1e-9:
        return np.zeros((H, W), np.float32)
    # DA-V2 predicts inverse depth; map to the reference's 0..255 convention
    # where LARGER values mean closer (the engine computes 255 - value)
    return (255.0 * (out - out.min()) / rng).astype(np.float32)


def init_params(key: jax.Array, cfg: DAConfig = None, hw=(70, 70)):
    cfg = cfg or DAConfig.vits()
    model = DepthAnythingV2(cfg)
    dummy = jnp.zeros((1, *hw, 3), jnp.float32)
    return model.init(key, dummy)["params"]
