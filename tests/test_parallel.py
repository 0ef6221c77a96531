"""Tensor-parallel (DPT/ViT) and spatial-partition (conv flagship) sharding:
each multi-device layout must reproduce the single-device step numerically.

The reference's only parallelism is nn.DataParallel (manydepth/trainer.py:
233-236); TP over a ('data', 'model') mesh and spatial H-partitioning over
('data', 'spatial') are TPU-native extensions — correctness is defined as
"identical math, different layout", which is exactly what these tests pin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polardepth_tpu.config import Config
from polardepth_tpu.data.synthetic import SyntheticHammer
from polardepth_tpu.models.dpt import DPTDepthModel
from polardepth_tpu.parallel.mesh import create_mesh
from polardepth_tpu.parallel import tp
from polardepth_tpu.train.dpt_trainer import make_dpt_train_step
from polardepth_tpu.train.state import create_train_state
from polardepth_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def dpt_setup():
    cfg = Config(height=32, width=32, batch_size=2, train_dpt=True,
                 dropout_rate=0.0, mesh_shape=(1,), donate_state=False,
                 max_depth=2.0)
    model = DPTDepthModel(backbone="vitb16")
    rng = jax.random.PRNGKey(0)
    example = {"x": jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, cfg.learning_rate)
    full = SyntheticHammer(cfg.height, cfg.width, seed=3).batch(2)
    batch_d = {k: jnp.asarray(full[k]) for k in ("color", "depth", "K")}
    return cfg, model, state, batch_d, rng


def test_tp_spec_rules(dpt_setup):
    mesh = tp.create_tp_mesh(2, 4)
    assert mesh.shape == {"data": 2, "model": 4}
    state = dpt_setup[2]
    specs = jax.tree_util.tree_map_with_path(
        lambda p, x: tp.tp_spec(p, x), state.params)
    blk = specs["block0"]
    P = jax.sharding.PartitionSpec
    assert blk["attn"]["qkv"]["kernel"] == P(None, "model")
    assert blk["attn"]["qkv"]["bias"] == P("model")
    assert blk["attn"]["proj"]["kernel"] == P("model", None)
    assert blk["attn"]["proj"]["bias"] == P()
    assert blk["fc1"]["kernel"] == P(None, "model")
    assert blk["fc2"]["kernel"] == P("model", None)
    # conv/patch-embed params stay replicated
    assert specs["patch_proj"]["kernel"] == P()


def test_tp_step_matches_single_device(dpt_setup):
    """One DPT train step on a (data=2, model=4) mesh == single device."""
    assert len(jax.devices()) >= 8
    cfg, model, state, batch, rng = dpt_setup

    plain = jax.jit(make_dpt_train_step(model, cfg))
    s_ref, logs_ref = plain(state, batch, rng)

    mesh = tp.create_tp_mesh(2, 4)
    tp.validate_tp(768, 12, 4)
    state_tp, sh = tp.shard_train_state(state, mesh)
    # the moments must shard exactly like their params
    frac = tp.sharded_fraction(state_tp.params)
    assert frac > 0.3, f"only {frac:.2f} of params sharded"
    qkv = state_tp.params["block0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    mu = state_tp.opt_state[0].mu["block0"]["attn"]["qkv"]["kernel"]
    assert mu.sharding.spec == qkv.sharding.spec

    step = tp.make_tp_train_step(model, cfg, mesh, sh, donate=False)
    s_tp, logs_tp = step(state_tp, batch, rng)
    # row-parallel matmuls split each contraction into per-shard partial
    # sums, so f32 reduction order differs from the single-device step;
    # a real sharding bug diverges at O(1), not O(1e-4).
    np.testing.assert_allclose(float(logs_ref["loss"]), float(logs_tp["loss"]),
                               rtol=5e-4)
    # updated params stay on the TP layout and match the reference step
    qkv2 = s_tp.params["block0"]["attn"]["qkv"]["kernel"]
    assert qkv2.sharding.spec == qkv.sharding.spec
    a = jax.device_get(s_ref.params["block0"]["attn"]["qkv"]["kernel"])
    b = jax.device_get(qkv2)
    lr = cfg.learning_rate
    np.testing.assert_allclose(a, b, rtol=1e-2, atol=2.0 * lr)


def test_tp_validate_rejects_bad_degree():
    with pytest.raises(ValueError):
        tp.validate_tp(768, 12, 5)


def test_spatial_partition_matches_single_device():
    """The supervised flagship step on a ('data','spatial')=(2,2) mesh must
    equal the 1-device step: spatial H-sharding is a layout, XLA's halo
    exchange keeps conv semantics."""
    assert len(jax.devices()) >= 4
    cfg = Config(height=32, width=32, batch_size=2, dropout_rate=0.0,
                 num_epochs=2, mesh_shape=(1,), donate_state=False)
    batch = SyntheticHammer(cfg.height, cfg.width, seed=5).batch(2)

    t1 = Trainer(cfg, steps_per_epoch=1, mesh=create_mesh((1,)),
                 log_fn=lambda *_: None)
    tsp = Trainer(cfg, steps_per_epoch=1, mesh=create_mesh((2, 2)),
                  log_fn=lambda *_: None)
    assert "spatial" in tsp.mesh.axis_names
    l1 = t1.train_epoch([batch])["loss"]
    lsp = tsp.train_epoch([batch])["loss"]
    np.testing.assert_allclose(l1, lsp, rtol=1e-4)
    lr = cfg.learning_rate
    p1 = jax.tree_util.tree_leaves(jax.device_get(t1.state.params))
    p2 = jax.tree_util.tree_leaves(jax.device_get(tsp.state.params))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=2.0 * lr)


def test_spatial_partition_eval_matches():
    cfg = Config(height=32, width=32, batch_size=2, dropout_rate=0.0,
                 num_epochs=2, mesh_shape=(1,), donate_state=False)
    batch = SyntheticHammer(cfg.height, cfg.width, seed=5).batch(2)
    t1 = Trainer(cfg, steps_per_epoch=1, mesh=create_mesh((1,)),
                 log_fn=lambda *_: None)
    tsp = Trainer(cfg, steps_per_epoch=1, mesh=create_mesh((2, 2)),
                  log_fn=lambda *_: None)
    m1 = t1.evaluate([batch])
    m2 = tsp.evaluate([batch])
    l1, tree1 = jax.tree_util.tree_flatten(m1)
    l2, tree2 = jax.tree_util.tree_flatten(m2)
    assert tree1 == tree2
    np.testing.assert_allclose(np.asarray(l1, np.float64),
                               np.asarray(l2, np.float64), rtol=1e-4)


def test_tri_tp_spec_rules():
    """tri_tp_spec: JointEncoder residual convs column/row, BN stats follow
    the column shard, shallow encoders + decoder replicate."""
    from polardepth_tpu.train.trainer import build_model
    cfg = Config(height=32, width=32, batch_size=2, dropout_rate=0.0,
                 mesh_shape=(1,), donate_state=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, 32, 32, 3), jnp.float32),
               "pol": jnp.zeros((1, 32, 32, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    specs = jax.tree_util.tree_map_with_path(
        lambda p, x: tp.tri_tp_spec(p, x), state.params)
    P = jax.sharding.PartitionSpec
    rb = specs["joint_encoder"]["ResidualBlock_5"]
    assert rb["ConvBNReLUDrop_0"]["TorchConv_0"]["Conv_0"]["kernel"] == \
        P(None, None, None, "model")
    assert rb["ConvBNReLUDrop_0"]["TorchConv_0"]["Conv_0"]["bias"] == \
        P("model")
    assert rb["ConvBNReLUDrop_0"]["BatchNorm_0"]["scale"] == P("model")
    assert rb["ConvBNReLUDrop_1"]["TorchConv_0"]["Conv_0"]["kernel"] == \
        P(None, None, "model", None)
    assert rb["ConvBNReLUDrop_1"]["TorchConv_0"]["Conv_0"]["bias"] == P()
    assert rb["ConvBNReLUDrop_1"]["BatchNorm_0"]["scale"] == P()
    # the 5x5 downsamples: column; the 1x1 fusion convs: replicated
    je = specs["joint_encoder"]
    assert je["ConvBNReLUDrop_3"]["TorchConv_0"]["Conv_0"]["kernel"] == \
        P(None, None, None, "model")
    assert je["ConvBNReLUDrop_0"]["TorchConv_0"]["Conv_0"]["kernel"] == P()
    # everything outside the joint trunk replicates
    flat = jax.tree_util.tree_leaves_with_path(specs)
    for path, s in flat:
        top = str(path[0].key)
        if top != "joint_encoder":
            assert s == P(), (path, s)
    # BN running stats follow their block's shard
    bs = jax.tree_util.tree_map_with_path(
        lambda p, x: tp.tri_tp_spec(p, x), state.batch_stats)
    rbs = bs["joint_encoder"]["ResidualBlock_5"]
    assert rbs["ConvBNReLUDrop_0"]["BatchNorm_0"]["mean"] == P("model")
    assert rbs["ConvBNReLUDrop_1"]["BatchNorm_0"]["mean"] == P()
    with pytest.raises(ValueError):
        tp.validate_tri_tp(3)


def test_tri_tp_step_matches_single_device():
    """One supervised tri-encoder train step on a (data=2, model=4) mesh
    == the single-device step (VERDICT r3 #10: TP beyond the DPT family)."""
    assert len(jax.devices()) >= 8
    from polardepth_tpu.train.trainer import build_model, make_train_step
    cfg = Config(height=32, width=32, batch_size=2, dropout_rate=0.0,
                 mesh_shape=(1,), donate_state=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, 32, 32, 3), jnp.float32),
               "pol": jnp.zeros((1, 32, 32, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, cfg.learning_rate)
    full = SyntheticHammer(cfg.height, cfg.width, seed=4).batch(2)
    batch = {k: jnp.asarray(full[k]) for k in ("color", "pol", "depth", "K")}

    plain = jax.jit(make_train_step(model, cfg))
    s_ref, logs_ref = plain(state, batch, rng)

    mesh = tp.create_tp_mesh(2, 4)
    tp.validate_tri_tp(4)
    state_tp, sh = tp.shard_train_state(state, mesh, spec_fn=tp.tri_tp_spec)
    frac = tp.sharded_fraction(state_tp.params)
    assert frac > 0.5, f"only {frac:.2f} of params sharded"
    k0 = state_tp.params["joint_encoder"]["ResidualBlock_5"][
        "ConvBNReLUDrop_0"]["TorchConv_0"]["Conv_0"]["kernel"]
    assert not k0.sharding.is_fully_replicated
    mu = state_tp.opt_state[0].mu["joint_encoder"]["ResidualBlock_5"][
        "ConvBNReLUDrop_0"]["TorchConv_0"]["Conv_0"]["kernel"]
    assert mu.sharding.spec == k0.sharding.spec

    step = tp.make_tri_tp_train_step(model, cfg, mesh, sh, donate=False)
    s_tp, logs_tp = step(state_tp, batch, rng)
    # row-parallel contractions change the f32 summation order only
    np.testing.assert_allclose(float(logs_ref["loss"]),
                               float(logs_tp["loss"]), rtol=5e-4)
    a = jax.device_get(s_ref.params["joint_encoder"]["ResidualBlock_5"][
        "ConvBNReLUDrop_0"]["TorchConv_0"]["Conv_0"]["kernel"])
    b = jax.device_get(s_tp.params["joint_encoder"]["ResidualBlock_5"][
        "ConvBNReLUDrop_0"]["TorchConv_0"]["Conv_0"]["kernel"])
    lr = cfg.learning_rate
    np.testing.assert_allclose(a, b, rtol=1e-2, atol=2.0 * lr)
    # BN running stats updated on-shard and match the single-device step
    sa = jax.device_get(s_ref.batch_stats["joint_encoder"][
        "ResidualBlock_5"]["ConvBNReLUDrop_0"]["BatchNorm_0"]["mean"])
    sb = jax.device_get(s_tp.batch_stats["joint_encoder"][
        "ResidualBlock_5"]["ConvBNReLUDrop_0"]["BatchNorm_0"]["mean"])
    # batch means are O(1e-2) with different summation order per layout
    np.testing.assert_allclose(sa, sb, rtol=1e-2, atol=1e-5)
