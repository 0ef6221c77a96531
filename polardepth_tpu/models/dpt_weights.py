"""Pretrained-weight grafting for the DPT family.

The reference gets its DPT backbones pretrained from timm
(`timm.create_model("vit_base_resnet50_384", pretrained=True)`,
/root/reference/manydepth/dpt/vit.py:494-543) and can load full MiDaS DPT
checkpoints (dpt/base_model.py:4-16).  Neither timm nor network access
exists on the TPU host, so the path is:

  1. offline: `python scripts/convert_torch_dpt.py --timm vit_base_resnet50_384 out.npz`
     (or --pt dpt_hybrid-midas-*.pt for a full model) dumps the torch
     state_dict verbatim to .npz;
  2. here: `load_dpt_npz(params, "out.npz", backbone="vitb_rn50")` grafts
     the arrays into a DPTDepthModel parameter tree, transposing layouts
     (torch conv OIHW -> flax HWIO, dense (O,I) -> (I,O), ConvTranspose2d
     (I,O,kh,kw) -> spatially flipped (kh,kw,I,O) — verified bit-exact vs
     torch.nn.functional.conv_transpose2d) and bilinearly resizing the
     position embedding to the configured grid (timm _resize_pos_embed,
     vit.py:148-162).

Backbone keys (trunk / patch_proj / cls_token / pos_embed / block*) are
required; DPT "scratch" keys (readout/reassemble/upsample/refinenet/head)
are loaded when present (full MiDaS checkpoints) and left at their fresh
initialisation otherwise (timm backbone-only dumps — matching the
reference, whose scratch is always trained from scratch unless a full DPT
checkpoint is given).
"""

from __future__ import annotations

import re
from typing import Callable, Optional

import numpy as np

_PREFIXES = ("pretrained.model.", "pretrained.", "module.")


def _conv(v):
    return np.transpose(v, (2, 3, 1, 0))


def _dense(v):
    return np.transpose(v, (1, 0))


def _conv_transpose(v):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out)
    # with a spatial flip (flax ConvTranspose does not mirror the kernel).
    return np.transpose(v[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _ident(v):
    return v


def source_entry(path: tuple) -> Optional[tuple[str, Callable]]:
    """Map a flax DPTDepthModel param path to (timm/MiDaS key, transform).

    Returns None for params with no torch counterpart (none currently)."""
    p = "/".join(path)

    m = re.fullmatch(r"trunk/stem_conv/kernel", p)
    if m:
        return "patch_embed.backbone.stem.conv.weight", _conv
    m = re.fullmatch(r"trunk/stem_norm/(scale|bias)", p)
    if m:
        suf = "weight" if m.group(1) == "scale" else "bias"
        return f"patch_embed.backbone.stem.norm.{suf}", _ident
    m = re.fullmatch(r"trunk/stage(\d)_block(\d+)/conv(\d)/kernel", p)
    if m:
        s, b, c = m.groups()
        return (f"patch_embed.backbone.stages.{s}.blocks.{b}.conv{c}.weight",
                _conv)
    m = re.fullmatch(r"trunk/stage(\d)_block(\d+)/norm(\d)/(scale|bias)", p)
    if m:
        s, b, c, w = m.groups()
        suf = "weight" if w == "scale" else "bias"
        return (f"patch_embed.backbone.stages.{s}.blocks.{b}.norm{c}.{suf}",
                _ident)
    m = re.fullmatch(r"trunk/stage(\d)_block(\d+)/downsample_conv/kernel", p)
    if m:
        s, b = m.groups()
        return (f"patch_embed.backbone.stages.{s}.blocks.{b}."
                "downsample.conv.weight", _conv)
    m = re.fullmatch(
        r"trunk/stage(\d)_block(\d+)/downsample_norm/(scale|bias)", p)
    if m:
        s, b, w = m.groups()
        suf = "weight" if w == "scale" else "bias"
        return (f"patch_embed.backbone.stages.{s}.blocks.{b}."
                f"downsample.norm.{suf}", _ident)

    m = re.fullmatch(r"patch_proj/(kernel|bias)", p)
    if m:
        if m.group(1) == "kernel":
            return "patch_embed.proj.weight", _conv
        return "patch_embed.proj.bias", _ident
    if p == "cls_token":
        return "cls_token", _ident
    if p == "pos_embed":
        return "pos_embed", _ident  # grid-resized separately

    m = re.fullmatch(r"block(\d+)/norm([12])/(scale|bias)", p)
    if m:
        i, n, w = m.groups()
        suf = "weight" if w == "scale" else "bias"
        return f"blocks.{i}.norm{n}.{suf}", _ident
    m = re.fullmatch(r"block(\d+)/attn/(qkv|proj)/(kernel|bias)", p)
    if m:
        i, which, w = m.groups()
        suf, tr = (("weight", _dense) if w == "kernel" else ("bias", _ident))
        return f"blocks.{i}.attn.{which}.{suf}", tr
    m = re.fullmatch(r"block(\d+)/fc([12])/(kernel|bias)", p)
    if m:
        i, n, w = m.groups()
        suf, tr = (("weight", _dense) if w == "kernel" else ("bias", _ident))
        return f"blocks.{i}.mlp.fc{n}.{suf}", tr

    # DPT scratch / reassemble (act_postprocess indices: 0=readout project,
    # 3=1x1 conv, 4=ConvTranspose (slots 0/1) or stride-2 conv (slot 3))
    m = re.fullmatch(r"readout(\d)/(kernel|bias)", p)
    if m:
        g, w = m.groups()
        suf, tr = (("weight", _dense) if w == "kernel" else ("bias", _ident))
        return f"act_postprocess{int(g) + 1}.0.project.0.{suf}", tr
    m = re.fullmatch(r"reassemble(\d)/Conv_0/(kernel|bias)", p)
    if m:
        g, w = m.groups()
        suf, tr = (("weight", _conv) if w == "kernel" else ("bias", _ident))
        return f"act_postprocess{int(g) + 1}.3.{suf}", tr
    m = re.fullmatch(r"upsample(\d)/(kernel|bias)", p)
    if m:
        g, w = m.groups()
        suf, tr = (("weight", _conv_transpose) if w == "kernel"
                   else ("bias", _ident))
        return f"act_postprocess{int(g) + 1}.4.{suf}", tr
    m = re.fullmatch(r"downsample3/Conv_0/(kernel|bias)", p)
    if m:
        suf, tr = (("weight", _conv) if m.group(1) == "kernel"
                   else ("bias", _ident))
        return f"act_postprocess4.4.{suf}", tr
    m = re.fullmatch(r"layer(\d)_rn/Conv_0/kernel", p)
    if m:
        return f"scratch.layer{m.group(1)}_rn.weight", _conv
    m = re.fullmatch(
        r"refinenet(\d)/(resConfUnit[12])/(conv[12])/Conv_0/(kernel|bias)", p)
    if m:
        n, unit, conv, w = m.groups()
        suf, tr = (("weight", _conv) if w == "kernel" else ("bias", _ident))
        return f"scratch.refinenet{n}.{unit}.{conv}.{suf}", tr
    m = re.fullmatch(r"refinenet(\d)/out_conv/Conv_0/(kernel|bias)", p)
    if m:
        n, w = m.groups()
        suf, tr = (("weight", _conv) if w == "kernel" else ("bias", _ident))
        return f"scratch.refinenet{n}.out_conv.{suf}", tr
    m = re.fullmatch(r"head([123])/Conv_0/(kernel|bias)", p)
    if m:
        idx = {"1": 0, "2": 2, "3": 4}[m.group(1)]
        suf, tr = (("weight", _conv) if m.group(2) == "kernel"
                   else ("bias", _ident))
        return f"scratch.output_conv.{idx}.{suf}", tr
    return None


_BACKBONE_ROOTS = ("trunk", "patch_proj", "cls_token", "pos_embed", "block")


def _is_backbone(path: tuple) -> bool:
    return str(path[0]).startswith(_BACKBONE_ROOTS)


def resize_pos_embed(pos: np.ndarray, grid_hw) -> np.ndarray:
    """timm _resize_pos_embed (vit.py:148-162): keep the cls slot, reshape
    the grid part to (gh, gw, C) (source assumed square, 384/16 = 24x24),
    bilinear align_corners=False resize to the target grid, re-flatten."""
    gh, gw = grid_hw
    cls_tok, grid = pos[:, :1], pos[:, 1:]
    n = grid.shape[1]
    if n == gh * gw:
        return pos
    gs = int(round(np.sqrt(n)))
    assert gs * gs == n, f"non-square source pos_embed grid ({n} tokens)"
    from polardepth_tpu.ops.resize import resize_bilinear
    g = grid.reshape(1, gs, gs, -1)
    g = np.asarray(resize_bilinear(g, (gh, gw)))
    return np.concatenate([cls_tok, g.reshape(1, gh * gw, -1)], axis=1)


def load_dpt_npz(params: dict, src, grid_hw=None, log=print) -> dict:
    """Graft a converted torch DPT/timm state_dict into a DPTDepthModel
    param tree.  `src`: npz path or {torch_name: array} dict.  `grid_hw`:
    the model's (H//16, W//16) token grid for position-embedding resize
    (required when it differs from the source's square grid).  Backbone
    keys must all be present; scratch/readout keys load when present.
    Returns a new tree; raises KeyError listing any missing backbone key."""
    import jax

    if isinstance(src, str):
        from polardepth_tpu.utils.torch_pth import load_array_dict
        raw = load_array_dict(src)
    else:
        raw = dict(src)
    state = {}
    for k, v in raw.items():
        for pre in _PREFIXES:
            if k.startswith(pre):
                k = k[len(pre):]
        state[k] = np.asarray(v)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    new = {}
    missing_backbone, loaded, kept = [], 0, 0
    for path, leaf in flat:
        tup = tuple(str(getattr(p, "key", p)) for p in path)
        entry = source_entry(tup)
        key = "/".join(tup)
        if entry is None:
            new[key] = np.asarray(leaf)
            kept += 1
            continue
        src_key, tr = entry
        if src_key not in state:
            if _is_backbone(tup):
                missing_backbone.append(src_key)
            else:
                new[key] = np.asarray(leaf)
                kept += 1
            continue
        v = tr(state[src_key])
        if tup == ("pos_embed",):
            n_target = leaf.shape[1] - 1
            hw = grid_hw
            if hw is None:
                gh = int(round(np.sqrt(n_target)))
                while n_target % gh:
                    gh -= 1
                hw = (gh, n_target // gh)
            assert hw[0] * hw[1] == n_target, (hw, n_target)
            v = resize_pos_embed(v, hw)
        if v.shape != leaf.shape:
            raise ValueError(f"{key}: converted shape {v.shape} != "
                             f"expected {leaf.shape} (source {src_key})")
        new[key] = v.astype(np.asarray(leaf).dtype)
        loaded += 1
    if missing_backbone:
        raise KeyError("missing backbone keys in source: "
                       + ", ".join(sorted(missing_backbone)[:8])
                       + (f" (+{len(missing_backbone) - 8} more)"
                          if len(missing_backbone) > 8 else ""))

    def rebuild(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, f"{prefix}{k}/")
            else:
                out[k] = new[f"{prefix}{k}"]
        return out

    log(f"DPT graft: {loaded} arrays loaded, {kept} kept at init")
    return rebuild(params)


def fabricate_source(params: dict, rng=None) -> dict:
    """Build a torch-layout state_dict with the exact keys/shapes
    load_dpt_npz expects for `params` — the test fixture standing in for a
    real timm dump (no timm/network on this host).  Values are random so
    orientation mistakes cannot cancel out."""
    import jax

    rng = rng or np.random.default_rng(0)
    inverse = {_conv: lambda v: np.transpose(v, (3, 2, 0, 1)),
               _dense: lambda v: np.transpose(v, (1, 0)),
               _conv_transpose:
                   lambda v: np.transpose(v, (2, 3, 0, 1))[:, :, ::-1, ::-1],
               _ident: lambda v: v}
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        tup = tuple(str(getattr(p, "key", p)) for p in path)
        entry = source_entry(tup)
        if entry is None:
            continue
        src_key, tr = entry
        val = rng.normal(size=np.asarray(leaf).shape).astype(np.float32)
        out[src_key] = inverse[tr](val)
    return out
