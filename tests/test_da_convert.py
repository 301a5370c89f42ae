"""Depth-Anything-V2 checkpoint conversion: golden test vs a torch replica.

The reference pipeline consumes DA-V2 depth maps from disk
(APD.cpp:1219-1223); our framework runs the network natively
(priors/depth_anything.py) with released torch checkpoints converted by
priors/convert.py.  This test builds a synthetic state dict with the
released layout, runs a minimal torch reimplementation of DA-V2's forward
(mirroring github.com/DepthAnything/Depth-Anything-V2 semantics), and checks
the converted Flax model against it numerically — pinning the weight-layout
transforms (conv/deconv orientation, qkv packing, LayerScale, align-corners
resizes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvpmvs.priors.convert import (config_for_state_dict, convert_state_dict,
                                   random_state_dict)
from dvpmvs.priors.depth_anything import DAConfig, DepthAnythingV2

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _torch_forward(sd, cfg, img_np):
    """DA-V2 forward in torch from a raw state dict (no module classes)."""
    t = lambda k: torch.from_numpy(np.asarray(sd[k], np.float32))
    x = torch.from_numpy(img_np).permute(0, 3, 1, 2)        # [B, 3, H, W]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (x - mean) / std

    C = cfg.embed_dim
    p = cfg.patch_size
    x = F.conv2d(x, t("pretrained.patch_embed.proj.weight"),
                 t("pretrained.patch_embed.proj.bias"), stride=p)
    B, _, hh, ww = x.shape
    x = x.flatten(2).transpose(1, 2)                        # [B, N, C]

    pos = t("pretrained.pos_embed")
    pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
    base = 37
    pos_grid = pos_grid.reshape(1, base, base, C).permute(0, 3, 1, 2)
    pos_grid = F.interpolate(pos_grid, size=(hh, ww), mode="bicubic",
                             align_corners=False)
    pos_grid = pos_grid.permute(0, 2, 3, 1).reshape(1, hh * ww, C)
    x = x + pos_grid
    cls_tok = t("pretrained.cls_token") + pos_cls
    x = torch.cat([cls_tok.expand(B, -1, -1), x], dim=1)

    feats = []
    H = cfg.num_heads
    for i in range(cfg.depth):
        pre = f"pretrained.blocks.{i}"
        h = F.layer_norm(x, (C,), t(f"{pre}.norm1.weight"),
                         t(f"{pre}.norm1.bias"))
        qkv = F.linear(h, t(f"{pre}.attn.qkv.weight"),
                       t(f"{pre}.attn.qkv.bias"))
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, H, C // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (C // H) ** -0.5
        attn = torch.einsum("bnhd,bmhd->bhnm", q * scale, k).softmax(-1)
        h = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        h = F.linear(h, t(f"{pre}.attn.proj.weight"),
                     t(f"{pre}.attn.proj.bias"))
        x = x + h * t(f"{pre}.ls1.gamma")
        h = F.layer_norm(x, (C,), t(f"{pre}.norm2.weight"),
                         t(f"{pre}.norm2.bias"))
        h = F.linear(h, t(f"{pre}.mlp.fc1.weight"), t(f"{pre}.mlp.fc1.bias"))
        h = F.gelu(h)
        h = F.linear(h, t(f"{pre}.mlp.fc2.weight"), t(f"{pre}.mlp.fc2.bias"))
        x = x + h * t(f"{pre}.ls2.gamma")
        if i in cfg.out_indices:
            feats.append((i, x))

    outs = dict(feats)
    normed = [F.layer_norm(outs[i], (C,), t("pretrained.norm.weight"),
                           t("pretrained.norm.bias"))[:, 1:]
              for i in cfg.out_indices]

    levels = []
    for i, tok in enumerate(normed):
        f_ = tok.transpose(1, 2).reshape(B, C, hh, ww)
        f_ = F.conv2d(f_, t(f"depth_head.projects.{i}.weight"),
                      t(f"depth_head.projects.{i}.bias"))
        if i == 0:
            f_ = F.conv_transpose2d(
                f_, t("depth_head.resize_layers.0.weight"),
                t("depth_head.resize_layers.0.bias"), stride=4)
        elif i == 1:
            f_ = F.conv_transpose2d(
                f_, t("depth_head.resize_layers.1.weight"),
                t("depth_head.resize_layers.1.bias"), stride=2)
        elif i == 3:
            f_ = F.conv2d(f_, t("depth_head.resize_layers.3.weight"),
                          t("depth_head.resize_layers.3.bias"),
                          stride=2, padding=1)
        f_ = F.conv2d(f_, t(f"depth_head.scratch.layer{i + 1}_rn.weight"),
                      None, padding=1)
        levels.append(f_)

    def rcu(x_, pre):
        h_ = F.relu(x_)
        h_ = F.conv2d(h_, t(f"{pre}.conv1.weight"), t(f"{pre}.conv1.bias"),
                      padding=1)
        h_ = F.relu(h_)
        h_ = F.conv2d(h_, t(f"{pre}.conv2.weight"), t(f"{pre}.conv2.bias"),
                      padding=1)
        return x_ + h_

    def fusion(r, x_, skip=None, size=None):
        pre = f"depth_head.scratch.refinenet{r}"
        if skip is not None:
            x_ = x_ + rcu(skip, f"{pre}.resConfUnit1")
        x_ = rcu(x_, f"{pre}.resConfUnit2")
        if size is None:
            size = (x_.shape[2] * 2, x_.shape[3] * 2)
        x_ = F.interpolate(x_, size=size, mode="bilinear", align_corners=True)
        return F.conv2d(x_, t(f"{pre}.out_conv.weight"),
                        t(f"{pre}.out_conv.bias"))

    l1, l2, l3, l4 = levels
    p4 = fusion(4, l4, size=l3.shape[2:])
    p3 = fusion(3, p4, l3, size=l2.shape[2:])
    p2 = fusion(2, p3, l2, size=l1.shape[2:])
    p1 = fusion(1, p2, l1)

    out = F.conv2d(p1, t("depth_head.scratch.output_conv1.weight"),
                   t("depth_head.scratch.output_conv1.bias"), padding=1)
    out = F.interpolate(out, size=(hh * p, ww * p), mode="bilinear",
                        align_corners=True)
    out = F.conv2d(out, t("depth_head.scratch.output_conv2.0.weight"),
                   t("depth_head.scratch.output_conv2.0.bias"), padding=1)
    out = F.relu(out)
    out = F.conv2d(out, t("depth_head.scratch.output_conv2.2.weight"),
                   t("depth_head.scratch.output_conv2.2.bias"))
    return F.relu(out)[:, 0].numpy()


def test_convert_matches_torch_replica():
    cfg = DAConfig(embed_dim=64, depth=3, num_heads=2,
                   out_indices=(0, 1, 2, 2), dpt_features=16,
                   dpt_out_channels=(8, 16, 24, 32))
    sd = random_state_dict(cfg, seed=3)
    params = convert_state_dict(sd, cfg)

    rng = np.random.default_rng(5)
    img = rng.uniform(size=(1, 2 * cfg.patch_size, 3 * cfg.patch_size, 3)
                      ).astype(np.float32)

    with torch.no_grad():
        ref = _torch_forward(sd, cfg, img)

    model = DepthAnythingV2(cfg)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(img))
    out = np.asarray(out)

    assert out.shape == ref.shape
    # flax path computes matmuls in bfloat16; compare loosely but tightly
    # enough to catch any layout/orientation mistake (those are O(1) wrong)
    denom = np.abs(ref).mean() + 1e-6
    rel = np.abs(out - ref).mean() / denom
    assert rel < 0.05, rel
    cc = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert cc > 0.99, cc


def test_config_inference_vits():
    sd = random_state_dict(DAConfig.vits(), seed=0)
    cfg = config_for_state_dict(sd)
    assert cfg.embed_dim == 384 and cfg.depth == 12
    assert cfg.num_heads == 6
    assert cfg.dpt_out_channels == (48, 96, 192, 384)
    assert cfg.out_indices == (2, 5, 8, 11)
