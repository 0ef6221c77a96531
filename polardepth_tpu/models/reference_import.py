"""Import reference-trained per-component checkpoints (weights_<epoch>/*.pth).

The reference's deliverable is a set of per-component torch state_dicts —
rgb_encoder / xolp_encoder / normals_encoder / joint_encoder / mono_depth
(reference manydepth/trainer.py:1597-1617 save format; loaded per-component
in evaluation.py:290-311).  This module maps those state_dicts (read torch-
free via utils/torch_pth.py) onto PolarDepthNet's parameter tree so a
reference-trained model runs on TPU for end-to-end output-parity checks.

Key correspondences (torch module tree -> flax auto-names):

  ShallowEncoder (pre_encoders.py:49-83)      ShallowEncoder
    Conv1 / Conv2 / Conv3                       ConvBNReLUDrop_{0,1,2}
    ResBlock{1,2,3}.conv{1,2}                   ResidualBlock_{0,1,2}.
                                                ConvBNReLUDrop_{0,1}
    <blk>.conv.{weight,bias}, <blk>.bn.*        TorchConv_0/Conv_0,
                                                BatchNorm_0

  JointEncoder (pre_encoders.py:116-164)      JointEncoder
    fc1, fc2, Conv1, Conv2                      ConvBNReLUDrop_{0,1,2,3}
    ResBlock{1..6}                              ResidualBlock_{0..5}

  DepthDecoder (depth_decoder.py:15-75)       DepthDecoder
    decoder.{0..9}   = upconv (4,0)..(0,1)      ConvBlockELU_{0..9}.
                       (.conv.conv.{w,b})        ReflectConv_0/Conv_0
    decoder.{10+k}   = dispconv scale k         ReflectConv_j/Conv_0 where
                       (.conv.{w,b})             j indexes scales DESCENDING
                                                 (call order i=4..0)

  ShallowResnetEncoder (resnet_encoder.py:783-822): 'encoder.' prefix
  stripped, then the torchvision ResNet18 mapping of
  models/resnet.py:load_torch_resnet18 (shallow).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def _hwio(w: np.ndarray) -> jnp.ndarray:
    """torch OIHW conv kernel -> flax HWIO."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _convblock(sd: dict, prefix: str):
    """Torch pre-encoder ConvBlock (conv+bn) -> ConvBNReLUDrop subtree."""
    p = {"TorchConv_0": {"Conv_0": {
            "kernel": _hwio(sd[f"{prefix}.conv.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.conv.bias"])}},
         "BatchNorm_0": {"scale": jnp.asarray(sd[f"{prefix}.bn.weight"]),
                         "bias": jnp.asarray(sd[f"{prefix}.bn.bias"])}}
    s = {"BatchNorm_0": {"mean": jnp.asarray(sd[f"{prefix}.bn.running_mean"]),
                         "var": jnp.asarray(sd[f"{prefix}.bn.running_var"])}}
    return p, s


def _resblock(sd: dict, prefix: str):
    p, s = {}, {}
    for i, conv in enumerate(("conv1", "conv2")):
        p[f"ConvBNReLUDrop_{i}"], s[f"ConvBNReLUDrop_{i}"] = _convblock(
            sd, f"{prefix}.{conv}")
    return p, s


def convert_shallow_encoder(sd: dict):
    """xolp_encoder.pth / normals_encoder.pth -> (params, batch_stats) under
    ShallowEncoder's flax names."""
    p, s = {}, {}
    pairs = [("ConvBNReLUDrop_0", "Conv1"), ("ResidualBlock_0", "ResBlock1"),
             ("ConvBNReLUDrop_1", "Conv2"), ("ResidualBlock_1", "ResBlock2"),
             ("ConvBNReLUDrop_2", "Conv3"), ("ResidualBlock_2", "ResBlock3")]
    for ours, theirs in pairs:
        fn = _resblock if theirs.startswith("Res") else _convblock
        p[ours], s[ours] = fn(sd, theirs)
    return p, s


def convert_joint_encoder(sd: dict):
    p, s = {}, {}
    pairs = [("ConvBNReLUDrop_0", "fc1"), ("ConvBNReLUDrop_1", "fc2"),
             ("ResidualBlock_0", "ResBlock1"), ("ResidualBlock_1", "ResBlock2"),
             ("ConvBNReLUDrop_2", "Conv1"),
             ("ResidualBlock_2", "ResBlock3"), ("ResidualBlock_3", "ResBlock4"),
             ("ConvBNReLUDrop_3", "Conv2"),
             ("ResidualBlock_4", "ResBlock5"), ("ResidualBlock_5", "ResBlock6")]
    for ours, theirs in pairs:
        fn = _resblock if theirs.startswith("Res") else _convblock
        p[ours], s[ours] = fn(sd, theirs)
    return p, s


def convert_depth_decoder(sd: dict, scales=(0, 1, 2, 3),
                          uncertainty: bool = False):
    """mono_depth.pth (ModuleList flattening of the reference's convs
    OrderedDict) -> DepthDecoder params.  No batch stats (decoder has no BN).
    """
    if uncertainty:
        raise NotImplementedError(
            "uncertainty-head checkpoints not supported (heads off in every "
            "published reference config)")
    p = {}
    for k in range(10):  # upconv (4,0),(4,1),(3,0),(3,1)...(0,0),(0,1)
        p[f"ConvBlockELU_{k}"] = {"ReflectConv_0": {"Conv_0": {
            "kernel": _hwio(sd[f"decoder.{k}.conv.conv.weight"]),
            "bias": jnp.asarray(sd[f"decoder.{k}.conv.conv.bias"])}}}
    # disp heads: torch list order is ascending scale (10+position); our
    # ReflectConv_j call order is descending i
    for j, i in enumerate(sorted(scales, reverse=True)):
        t = 10 + list(scales).index(i)
        p[f"ReflectConv_{j}"] = {"Conv_0": {
            "kernel": _hwio(sd[f"decoder.{t}.conv.weight"]),
            "bias": jnp.asarray(sd[f"decoder.{t}.conv.bias"])}}
    return p, {}


def convert_rgb_encoder(sd: dict):
    """rgb_encoder.pth (ShallowResnetEncoder wrapping torchvision resnet18
    under the 'encoder.' prefix) -> ShallowResNet18Stem (params, stats)."""
    from polardepth_tpu.models.resnet import load_torch_resnet18
    stripped = {k[len("encoder."):]: np.asarray(v) for k, v in sd.items()
                if k.startswith("encoder.")
                and "num_batches_tracked" not in k}
    return load_torch_resnet18(stripped, shallow=True)


_COMPONENTS = {
    "rgb_encoder": convert_rgb_encoder,
    "xolp_encoder": convert_shallow_encoder,
    "normals_encoder": convert_shallow_encoder,
    "joint_encoder": convert_joint_encoder,
    "mono_depth": convert_depth_decoder,
}

# flax nests the conv stack of the normals encoder one level down
_SUBTREE = {"normals_encoder": ("ShallowEncoder_0",)}


def load_reference_components(weights_dir: str, params: dict,
                              batch_stats: dict, log=print):
    """Graft every <component>.pth present in weights_dir into the
    (params, batch_stats) trees of a PolarDepthNet train state.  Returns
    (params, batch_stats, loaded_names); raises if nothing was found or a
    present component's shapes don't match the model graph."""
    from polardepth_tpu.utils.torch_pth import load_state_dict
    import flax

    params = flax.core.unfreeze(params)
    batch_stats = flax.core.unfreeze(batch_stats or {})
    loaded = []

    # a fused-encoder model (the round-5 shipped default) has no
    # xolp_encoder / normals_encoder subtrees — the two reference
    # checkpoints fuse into its block-diagonal layout instead (exact:
    # fuse_modality_params is the inverse of the export-side split)
    if "fused_encoders" in params:
        from polardepth_tpu.models.pre_encoders import fuse_modality_params
        px = os.path.join(weights_dir, "xolp_encoder.pth")
        pn = os.path.join(weights_dir, "normals_encoder.pth")
        if os.path.exists(px) and os.path.exists(pn):
            def _conv(path):
                sd = {k: v for k, v in load_state_dict(path).items()
                      if isinstance(v, np.ndarray)}
                return convert_shallow_encoder(sd)
            xp, xs = _conv(px)
            np_p, np_s = _conv(pn)
            src_p = fuse_modality_params(xp, np_p)
            src_s = fuse_modality_params(xs, np_s)
            import jax
            want = jax.tree_util.tree_map(
                lambda a: a.shape, params["fused_encoders"])
            got = jax.tree_util.tree_map(lambda a: a.shape, src_p)
            if want != got:
                raise ValueError(
                    "fused_encoders: xolp/normals checkpoint shapes do not "
                    "match the model graph (flag mismatch?)")
            params["fused_encoders"] = src_p
            batch_stats["fused_encoders"] = src_s
            loaded += ["xolp_encoder", "normals_encoder"]

    for name, convert in _COMPONENTS.items():
        path = os.path.join(weights_dir, f"{name}.pth")
        if not os.path.exists(path) or name not in params:
            continue
        sd = {k: v for k, v in load_state_dict(path).items()
              if isinstance(v, np.ndarray)}
        src_p, src_s = convert(sd)
        dst_p, dst_s = params[name], batch_stats.setdefault(name, {})
        for sub in _SUBTREE.get(name, ()):
            dst_p = dst_p.setdefault(sub, {})
            dst_s = dst_s.setdefault(sub, {})
        import jax
        want = jax.tree_util.tree_map(lambda a: a.shape,
                                      {k: dst_p[k] for k in src_p})
        got = jax.tree_util.tree_map(lambda a: a.shape, src_p)
        if want != got:
            raise ValueError(f"{name}: checkpoint shapes do not match the "
                             f"model graph (flag mismatch?)")
        dst_p.update(src_p)
        dst_s.update(src_s)
        loaded.append(name)
    if not loaded:
        raise FileNotFoundError(
            f"no reference component checkpoints found in {weights_dir} "
            f"(expected any of {', '.join(_COMPONENTS)}.pth)")
    log(f"reference components loaded: {', '.join(loaded)}")
    return params, batch_stats, loaded
