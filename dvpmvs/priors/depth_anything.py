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
        pos_grid = jax.image.resize(pos_grid, (1, hh, ww, cfg.embed_dim),
                                    "bilinear")
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
        x_final = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        feats = []
        for i in cfg.out_indices:
            t = outs.get(i, x_final)
            feats.append(t[:, 1:])           # drop CLS
        return feats, (hh, ww)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), dtype=jnp.bfloat16, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=jnp.bfloat16, name="conv2")(h)
        return x + h


class DPTHead(nn.Module):
    cfg: DAConfig

    @nn.compact
    def __call__(self, feats, grid_hw, out_hw):
        cfg = self.cfg
        hh, ww = grid_hw
        # reassemble: project + rescale to 4 pyramid levels (x4, x2, x1, /2)
        levels = []
        scales = (4, 2, 1, 0.5)
        for i, (tok, oc, s) in enumerate(zip(feats, cfg.dpt_out_channels,
                                             scales)):
            B, N, C = tok.shape
            f = tok.reshape(B, hh, ww, C)
            f = nn.Conv(oc, (1, 1), dtype=jnp.bfloat16,
                        name=f"project{i}")(f)
            nh, nw = int(hh * s), int(ww * s)
            f = jax.image.resize(f.astype(jnp.float32), (B, nh, nw, oc),
                                 "bilinear").astype(jnp.bfloat16)
            f = nn.Conv(cfg.dpt_features, (3, 3), dtype=jnp.bfloat16,
                        use_bias=False, name=f"scratch{i}")(f)
            levels.append(f)

        # fusion top-down (each stage resizes to the NEXT level's extent so
        # odd grid sizes stay consistent)
        x = levels[3]
        for i in (3, 2, 1, 0):
            if i != 3:
                x = x + levels[i]
            x = ResidualConvUnit(cfg.dpt_features, name=f"rcu{i}")(x)
            B, h, w, C = x.shape
            if i > 0:
                nh, nw = levels[i - 1].shape[1:3]
            else:
                nh, nw = h * 2, w * 2
            x = jax.image.resize(x.astype(jnp.float32), (B, nh, nw, C),
                                 "bilinear").astype(jnp.bfloat16)
            x = nn.Conv(cfg.dpt_features, (1, 1), dtype=jnp.bfloat16,
                        name=f"fuse_out{i}")(x)

        x = nn.Conv(cfg.dpt_features // 2, (3, 3), dtype=jnp.bfloat16,
                    name="head1")(x)
        B, h, w, C = x.shape
        x = jax.image.resize(x.astype(jnp.float32), (B, *out_hw, C),
                             "bilinear").astype(jnp.bfloat16)
        x = nn.Conv(32, (3, 3), dtype=jnp.bfloat16, name="head2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=jnp.bfloat16, name="head3")(x)
        return nn.relu(x.astype(jnp.float32))[..., 0]


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
