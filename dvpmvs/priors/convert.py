"""Depth-Anything-V2 checkpoint conversion: torch ``.pth`` -> Flax params.

The reference consumes precomputed ``dep/%08d.dmb`` maps (APD.cpp:1219-1223)
produced by the released DA-V2 torch models; this converter maps a released
state dict (https://github.com/DepthAnything/Depth-Anything-V2 layouts,
``depth_anything_v2_vits.pth`` etc.) onto :mod:`.depth_anything`'s module
tree so the prior runs natively as a JAX/Flax ViT on TPU.

Weight-layout transforms:
  Conv2d          [O, I, kh, kw] -> [kh, kw, I, O]
  ConvTranspose2d [I, O, kh, kw] -> [kh, kw, I, O]
  Linear          [O, I]         -> [I, O]
  LayerNorm       weight/bias    -> scale/bias
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .depth_anything import DAConfig


def _conv(w):
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _deconv(w):
    # flax ConvTranspose (transpose_kernel=False) needs the spatial flip of
    # torch's ConvTranspose2d kernel (verified in tests/test_da_convert.py)
    k = np.transpose(np.asarray(w, np.float32), (2, 3, 0, 1))
    return np.ascontiguousarray(k[::-1, ::-1])


def _lin(w):
    return np.transpose(np.asarray(w, np.float32), (1, 0))


def _arr(w):
    return np.asarray(w, np.float32)


def config_for_state_dict(sd: Dict[str, Any]) -> DAConfig:
    """Infer the DA-V2 variant (vits/vitb/vitl) from tensor shapes."""
    C = int(np.asarray(sd["pretrained.cls_token"]).shape[-1])
    depth = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("pretrained.blocks."))
    heads = {384: 6, 768: 12, 1024: 16}[C]
    oc = tuple(int(np.asarray(
        sd[f"depth_head.projects.{i}.weight"]).shape[0]) for i in range(4))
    feat = int(np.asarray(sd["depth_head.scratch.layer1_rn.weight"]).shape[0])
    idx = {12: (2, 5, 8, 11), 24: (4, 11, 17, 23)}[depth]
    return DAConfig(embed_dim=C, depth=depth, num_heads=heads,
                    out_indices=idx, dpt_features=feat, dpt_out_channels=oc)


def convert_state_dict(sd: Dict[str, Any], cfg: DAConfig | None = None
                       ) -> Dict[str, Any]:
    """Torch DA-V2 state dict -> Flax ``params`` tree (pure numpy)."""
    cfg = cfg or config_for_state_dict(sd)
    g = lambda k: sd[k]

    backbone: Dict[str, Any] = {
        "cls_token": _arr(g("pretrained.cls_token")),
        "pos_embed": _arr(g("pretrained.pos_embed")),
        "patch_embed": {
            "kernel": _conv(g("pretrained.patch_embed.proj.weight")),
            "bias": _arr(g("pretrained.patch_embed.proj.bias")),
        },
        "norm": {"scale": _arr(g("pretrained.norm.weight")),
                 "bias": _arr(g("pretrained.norm.bias"))},
    }
    for i in range(cfg.depth):
        p = f"pretrained.blocks.{i}"
        backbone[f"block{i}"] = {
            "norm1": {"scale": _arr(g(f"{p}.norm1.weight")),
                      "bias": _arr(g(f"{p}.norm1.bias"))},
            "attn": {
                "qkv": {"kernel": _lin(g(f"{p}.attn.qkv.weight")),
                        "bias": _arr(g(f"{p}.attn.qkv.bias"))},
                "proj": {"kernel": _lin(g(f"{p}.attn.proj.weight")),
                         "bias": _arr(g(f"{p}.attn.proj.bias"))},
            },
            "ls1": _arr(g(f"{p}.ls1.gamma")),
            "norm2": {"scale": _arr(g(f"{p}.norm2.weight")),
                      "bias": _arr(g(f"{p}.norm2.bias"))},
            "mlp_fc1": {"kernel": _lin(g(f"{p}.mlp.fc1.weight")),
                        "bias": _arr(g(f"{p}.mlp.fc1.bias"))},
            "mlp_fc2": {"kernel": _lin(g(f"{p}.mlp.fc2.weight")),
                        "bias": _arr(g(f"{p}.mlp.fc2.bias"))},
            "ls2": _arr(g(f"{p}.ls2.gamma")),
        }

    head: Dict[str, Any] = {}
    for i in range(4):
        head[f"project{i}"] = {
            "kernel": _conv(g(f"depth_head.projects.{i}.weight")),
            "bias": _arr(g(f"depth_head.projects.{i}.bias"))}
        head[f"layer{i + 1}_rn"] = {
            "kernel": _conv(g(f"depth_head.scratch.layer{i + 1}_rn.weight"))}
    for i, tf in ((0, _deconv), (1, _deconv), (3, _conv)):
        head[f"resize{i}"] = {
            "kernel": tf(g(f"depth_head.resize_layers.{i}.weight")),
            "bias": _arr(g(f"depth_head.resize_layers.{i}.bias"))}
    for r in range(1, 5):
        p = f"depth_head.scratch.refinenet{r}"
        blk = {"out_conv": {"kernel": _conv(g(f"{p}.out_conv.weight")),
                            "bias": _arr(g(f"{p}.out_conv.bias"))}}
        for u in (1, 2):
            if r == 4 and u == 1:
                continue  # refinenet4 takes no skip; its resConfUnit1 is
                          # dead weight in the released checkpoints too
            blk[f"resConfUnit{u}"] = {
                "conv1": {"kernel": _conv(g(f"{p}.resConfUnit{u}.conv1.weight")),
                          "bias": _arr(g(f"{p}.resConfUnit{u}.conv1.bias"))},
                "conv2": {"kernel": _conv(g(f"{p}.resConfUnit{u}.conv2.weight")),
                          "bias": _arr(g(f"{p}.resConfUnit{u}.conv2.bias"))},
            }
        head[f"refinenet{r}"] = blk
    head["output_conv1"] = {
        "kernel": _conv(g("depth_head.scratch.output_conv1.weight")),
        "bias": _arr(g("depth_head.scratch.output_conv1.bias"))}
    head["output_conv2a"] = {
        "kernel": _conv(g("depth_head.scratch.output_conv2.0.weight")),
        "bias": _arr(g("depth_head.scratch.output_conv2.0.bias"))}
    head["output_conv2b"] = {
        "kernel": _conv(g("depth_head.scratch.output_conv2.2.weight")),
        "bias": _arr(g("depth_head.scratch.output_conv2.2.bias"))}

    return {"backbone": backbone, "head": head}


def load_torch_checkpoint(path) -> tuple:
    """Load a released ``.pth`` (or an ``.npz`` of the same keys) and
    convert.  Returns (params, cfg)."""
    p = str(path)
    if p.endswith(".npz"):
        sd = dict(np.load(p))
    else:
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(p, map_location="cpu", weights_only=True).items()}
    cfg = config_for_state_dict(sd)
    return convert_state_dict(sd, cfg), cfg


def random_state_dict(cfg: DAConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    """A synthetic torch-layout state dict with the released checkpoints'
    exact keys and shapes — the converter's golden-test input."""
    rng = np.random.default_rng(seed)
    C, f = cfg.embed_dim, cfg.dpt_features
    oc = cfg.dpt_out_channels
    hid = int(C * cfg.mlp_ratio)
    sd = {
        "pretrained.cls_token": rng.normal(size=(1, 1, C)),
        "pretrained.pos_embed": rng.normal(size=(1, 37 * 37 + 1, C)),
        "pretrained.patch_embed.proj.weight": rng.normal(
            size=(C, 3, cfg.patch_size, cfg.patch_size)) * 0.02,
        "pretrained.patch_embed.proj.bias": rng.normal(size=(C,)),
        "pretrained.norm.weight": np.ones(C),
        "pretrained.norm.bias": np.zeros(C),
    }
    for i in range(cfg.depth):
        p = f"pretrained.blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": np.ones(C), f"{p}.norm1.bias": np.zeros(C),
            f"{p}.attn.qkv.weight": rng.normal(size=(3 * C, C)) * 0.02,
            f"{p}.attn.qkv.bias": np.zeros(3 * C),
            f"{p}.attn.proj.weight": rng.normal(size=(C, C)) * 0.02,
            f"{p}.attn.proj.bias": np.zeros(C),
            f"{p}.ls1.gamma": np.full(C, 1e-5),
            f"{p}.norm2.weight": np.ones(C), f"{p}.norm2.bias": np.zeros(C),
            f"{p}.mlp.fc1.weight": rng.normal(size=(hid, C)) * 0.02,
            f"{p}.mlp.fc1.bias": np.zeros(hid),
            f"{p}.mlp.fc2.weight": rng.normal(size=(C, hid)) * 0.02,
            f"{p}.mlp.fc2.bias": np.zeros(C),
            f"{p}.ls2.gamma": np.full(C, 1e-5),
        })
    for i in range(4):
        sd[f"depth_head.projects.{i}.weight"] = rng.normal(
            size=(oc[i], C, 1, 1)) * 0.05
        sd[f"depth_head.projects.{i}.bias"] = np.zeros(oc[i])
        sd[f"depth_head.scratch.layer{i + 1}_rn.weight"] = rng.normal(
            size=(f, oc[i], 3, 3)) * 0.05
    sd["depth_head.resize_layers.0.weight"] = rng.normal(
        size=(oc[0], oc[0], 4, 4)) * 0.05
    sd["depth_head.resize_layers.0.bias"] = np.zeros(oc[0])
    sd["depth_head.resize_layers.1.weight"] = rng.normal(
        size=(oc[1], oc[1], 2, 2)) * 0.05
    sd["depth_head.resize_layers.1.bias"] = np.zeros(oc[1])
    sd["depth_head.resize_layers.3.weight"] = rng.normal(
        size=(oc[3], oc[3], 3, 3)) * 0.05
    sd["depth_head.resize_layers.3.bias"] = np.zeros(oc[3])
    for r in range(1, 5):
        p = f"depth_head.scratch.refinenet{r}"
        for u in (1, 2):
            sd[f"{p}.resConfUnit{u}.conv1.weight"] = rng.normal(
                size=(f, f, 3, 3)) * 0.05
            sd[f"{p}.resConfUnit{u}.conv1.bias"] = np.zeros(f)
            sd[f"{p}.resConfUnit{u}.conv2.weight"] = rng.normal(
                size=(f, f, 3, 3)) * 0.05
            sd[f"{p}.resConfUnit{u}.conv2.bias"] = np.zeros(f)
        sd[f"{p}.out_conv.weight"] = rng.normal(size=(f, f, 1, 1)) * 0.05
        sd[f"{p}.out_conv.bias"] = np.zeros(f)
    sd["depth_head.scratch.output_conv1.weight"] = rng.normal(
        size=(f // 2, f, 3, 3)) * 0.05
    sd["depth_head.scratch.output_conv1.bias"] = np.zeros(f // 2)
    sd["depth_head.scratch.output_conv2.0.weight"] = rng.normal(
        size=(32, f // 2, 3, 3)) * 0.05
    sd["depth_head.scratch.output_conv2.0.bias"] = np.zeros(32)
    sd["depth_head.scratch.output_conv2.2.weight"] = rng.normal(
        size=(1, 32, 1, 1)) * 0.05
    sd["depth_head.scratch.output_conv2.2.bias"] = np.zeros(1)
    return {k: v.astype(np.float32) for k, v in sd.items()}
