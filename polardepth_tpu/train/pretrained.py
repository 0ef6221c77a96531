"""ImageNet-pretrained ResNet18 initialisation (--weights_init pretrained).

The reference's accuracy table is built on ImageNet-pretrained torchvision
ResNet18 weights for the RGB encoder, the pose encoder (with conv1 weights
tiled over stacked frames and divided by the frame count,
reference manydepth/networks/resnet_encoder.py:46-54) and the cost-volume
matching encoder (resnet_encoder.py:343,374: `models.resnet18(pretrained)`);
the trainer selects this with weights_init="pretrained"
(trainer.py:176,193,217).

torchvision is not importable in the TPU environment, so the weights arrive
as a one-time offline .npz dump (scripts/convert_torch_resnet18.py) that
`apply_pretrained` grafts into an already-initialised train-state param tree.
Grafting is structural: every subtree that looks like a torchvision ResNet18
stem (a 7x7 Conv_0 producing 64 channels over 3*k input channels, followed by
BasicBlocks) is recognised and replaced, so the same .npz initialises
  * PolarDepthNet.rgb_encoder           (shallow: conv1 + layer1-2)
  * PoseNet.pose_encoder                (full, 2-frame conv1 averaging)
  * CostVolumeEncoder                   (split: stem+layer1 in the feature
                                         extractor, layers2-4 after the
                                         reduce conv)
wherever they sit in the tree (mono path, teacher-student path, ...).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from polardepth_tpu.models.resnet import load_torch_resnet18


def _is_stem_node(node) -> Tuple[bool, int]:
    """(is a ResNet18 stem-bearing dict, num_input_images)."""
    if not isinstance(node, dict) or "Conv_0" not in node:
        return False, 0
    conv = node["Conv_0"]
    if not (isinstance(conv, dict) and "kernel" in conv):
        return False, 0
    k = conv["kernel"]
    if getattr(k, "shape", None) is None or k.ndim != 4:
        return False, 0
    kh, kw, cin, cout = k.shape
    if (kh, kw) != (7, 7) or cout != 64 or cin % 3 != 0:
        return False, 0
    if "BasicBlock_0" not in node:
        return False, 0
    return True, cin // 3


def _n_blocks(node) -> int:
    return sum(1 for key in node if key.startswith("BasicBlock_"))


def _is_trunk_node(node) -> bool:
    """layers2-4 of the cost-volume encoder: six BasicBlocks whose first
    block maps 64 -> 128 channels, with no stem conv of its own."""
    if not isinstance(node, dict) or "BasicBlock_0" not in node:
        return False
    if "Conv_0" in node or _n_blocks(node) != 6:
        return False
    b0 = node["BasicBlock_0"]
    k = b0.get("Conv_0", {}).get("kernel")
    return getattr(k, "shape", None) is not None and k.shape[-2:] == (64, 128)


def _renumber_trunk(params: dict, stats: dict) -> Tuple[dict, dict]:
    """Full-encoder BasicBlock_2..7 (layers2-4) -> BasicBlock_0..5."""
    p = {f"BasicBlock_{i}": params[f"BasicBlock_{i + 2}"] for i in range(6)}
    s = {f"BasicBlock_{i}": stats[f"BasicBlock_{i + 2}"] for i in range(6)}
    return p, s


def _same_shapes(dst, src) -> bool:
    import jax
    try:
        d = jax.tree_util.tree_map(lambda a: a.shape, dst)
        s = jax.tree_util.tree_map(lambda a: a.shape, src)
    except Exception:
        return False
    return d == s


def apply_pretrained(params, batch_stats, npz_path: str,
                     log_fn=print):
    """Graft converted torchvision ResNet18 weights into every recognised
    encoder subtree.  Returns (params, batch_stats, grafted_paths); raises if
    the npz is missing or nothing in the tree matched."""
    if not npz_path or not os.path.exists(npz_path):
        raise FileNotFoundError(
            "weights_init='pretrained' needs a converted torchvision "
            f"ResNet18 .npz (got pretrained_weights_path={npz_path!r}); "
            "generate it offline with scripts/convert_torch_resnet18.py "
            "on a machine that has torchvision.")

    import flax

    params = flax.core.unfreeze(params)
    batch_stats = flax.core.unfreeze(batch_stats or {})
    full_p, full_s = load_torch_resnet18(npz_path, shallow=False)
    grafted = []

    def visit(p_node, s_node, path):
        if not isinstance(p_node, dict):
            return
        is_stem, n_img = _is_stem_node(p_node)
        if is_stem:
            n_blocks = _n_blocks(p_node)
            if n_blocks in (4, 8):  # shallow stem / full encoder
                src_p, src_s = load_torch_resnet18(
                    npz_path, shallow=(n_blocks == 4),
                    num_input_images=n_img)
            elif n_blocks == 2:      # cost-volume feature extractor
                src_p = {k: full_p[k] for k in
                         ("Conv_0", "BatchNorm_0", "BasicBlock_0",
                          "BasicBlock_1")}
                src_s = {k: full_s[k] for k in
                         ("BatchNorm_0", "BasicBlock_0", "BasicBlock_1")}
            else:
                return
            if _same_shapes({k: p_node[k] for k in src_p}, src_p):
                p_node.update(src_p)
                for k in src_s:
                    s_node[k] = src_s[k]
                grafted.append("/".join(path) or "<root>")
            return
        if _is_trunk_node(p_node):
            src_p, src_s = _renumber_trunk(full_p, full_s)
            if _same_shapes({k: p_node[k] for k in src_p}, src_p):
                p_node.update(src_p)
                for k in src_s:
                    s_node[k] = src_s[k]
                grafted.append("/".join(path) + ":layers2-4")
            # fall through: trunk siblings may still hold nested stems
        for k, v in p_node.items():
            if isinstance(v, dict):
                visit(v, s_node.setdefault(k, {}), path + [k])

    visit(params, batch_stats, [])

    def prune_empty(d):
        """Drop the empty stat dicts setdefault created while walking
        BN-free subtrees, so the batch_stats pytree structure is unchanged."""
        if not isinstance(d, dict):
            return d
        out = {k: prune_empty(v) for k, v in d.items()}
        return {k: v for k, v in out.items()
                if not (isinstance(v, dict) and not v)}

    batch_stats = prune_empty(batch_stats)
    if not grafted:
        raise ValueError(
            "weights_init='pretrained': no ResNet18 encoder subtree found "
            "in the parameter tree to graft the ImageNet weights into.")
    log_fn(f"pretrained ResNet18 grafted into: {', '.join(grafted)}")
    return params, batch_stats, grafted


def maybe_apply_pretrained(state, cfg, log_fn=print):
    """If cfg.weights_init == 'pretrained', return a state whose params /
    batch_stats carry the ImageNet encoder weights; otherwise unchanged."""
    if cfg.weights_init != "pretrained":
        return state
    params, stats, _ = apply_pretrained(
        state.params, state.batch_stats, cfg.pretrained_weights_path, log_fn)
    return state.replace(params=params, batch_stats=stats)
