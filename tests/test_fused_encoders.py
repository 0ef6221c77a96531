"""FusedModalityEncoders: the groups=2 fusion of the XOLP + normals
ShallowEncoders must be EXACTLY the two separate encoders (grouped convs
never mix groups; BN/ReLU/pool are per-channel) — pinned by converting a
separate-encoder checkpoint with fuse_modality_params and comparing
outputs.  Reference for the separate graphs: pre_encoders.py:49-113."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polardepth_tpu.models.pre_encoders import (
    ShallowEncoder, ShallowNormalsEncoder, FusedModalityEncoders,
    fuse_modality_params)


@pytest.fixture(scope="module")
def separate_and_fused():
    rng = np.random.default_rng(0)
    xolp = jnp.asarray(rng.uniform(0, 1, (2, 32, 48, 2)), jnp.float32)
    kx, kn = jax.random.split(jax.random.PRNGKey(7))
    xe = ShallowEncoder("XOLP", dropout_rate=0.0)
    ne = ShallowNormalsEncoder(dropout_rate=0.0)
    vx = xe.init(kx, xolp)
    vn = ne.init(kn, xolp)
    fused = FusedModalityEncoders(dropout_rate=0.0)
    vf = {
        "params": fuse_modality_params(
            vx["params"], vn["params"]["ShallowEncoder_0"]),
        "batch_stats": fuse_modality_params(
            vx["batch_stats"], vn["batch_stats"]["ShallowEncoder_0"]),
    }
    return xolp, xe, ne, vx, vn, fused, vf


def test_fused_param_count_matches(separate_and_fused):
    _, _, _, vx, vn, fused, vf = separate_and_fused
    n_sep = sum(x.size for x in jax.tree_util.tree_leaves(vx["params"])) + \
        sum(x.size for x in jax.tree_util.tree_leaves(vn["params"]))
    n_fused = sum(np.asarray(x).size
                  for x in jax.tree_util.tree_leaves(vf["params"]))
    assert n_fused == n_sep


def test_fused_matches_separate_eval(separate_and_fused):
    xolp, xe, ne, vx, vn, fused, vf = separate_and_fused
    a = xe.apply(vx, xolp)
    b = ne.apply(vn, xolp)
    ref = jnp.concatenate([a, b], axis=-1)
    got = fused.apply(jax.tree_util.tree_map(jnp.asarray, vf), xolp)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_init_tree_matches_conversion_shapes(separate_and_fused):
    """A fresh fused init must produce exactly the converted tree's
    structure/shapes (so checkpoints round-trip)."""
    xolp, _, _, _, _, fused, vf = separate_and_fused
    vi = fused.init(jax.random.PRNGKey(0), xolp)
    flat_i = jax.tree_util.tree_leaves_with_path(vi["params"])
    flat_c = dict(
        (jax.tree_util.keystr(p), np.asarray(x).shape)
        for p, x in jax.tree_util.tree_leaves_with_path(vf["params"]))
    assert len(flat_i) == len(flat_c)
    for p, x in flat_i:
        k = jax.tree_util.keystr(p)
        assert k in flat_c and flat_c[k] == x.shape, (k, x.shape)


def test_network_forward_fused():
    from polardepth_tpu.models.network import PolarDepthNet
    rng = np.random.default_rng(1)
    color = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float32)
    pol = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 4)), jnp.float32)
    m = PolarDepthNet(dropout_rate=0.0, fused_encoders=True)
    v = m.init(jax.random.PRNGKey(0), color, pol=pol)
    out = m.apply(v, color, pol=pol)
    assert out[("disp", 0)].shape == (1, 64, 96, 1)
    assert np.isfinite(np.asarray(out[("disp", 0)])).all()
    # the fused trunk exists, the separate ones don't
    assert "fused_encoders" in v["params"]
    assert "xolp_encoder" not in v["params"]


def test_network_fused_matches_separate_with_converted_params():
    """Full-network parity: build the separate-encoder net, convert its
    modality-encoder params into the fused layout, and check the depth
    outputs agree (the joint encoder consumes the identical concat)."""
    from polardepth_tpu.models.network import PolarDepthNet
    rng = np.random.default_rng(2)
    color = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float32)
    pol = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 4)), jnp.float32)
    sep = PolarDepthNet(dropout_rate=0.0)
    vs = sep.init(jax.random.PRNGKey(3), color, pol=pol)
    out_sep = sep.apply(vs, color, pol=pol)

    def convert(tree):
        t = {k: v for k, v in tree.items()
             if k not in ("xolp_encoder", "normals_encoder")}
        t["fused_encoders"] = fuse_modality_params(
            tree["xolp_encoder"],
            tree["normals_encoder"]["ShallowEncoder_0"])
        return t

    fusedm = PolarDepthNet(dropout_rate=0.0, fused_encoders=True)
    vf = {"params": convert(vs["params"]),
          "batch_stats": convert(vs["batch_stats"])}
    vf = jax.tree_util.tree_map(jnp.asarray, vf)
    out_fused = fusedm.apply(vf, color, pol=pol)
    for s in (0, 1, 2, 3):
        np.testing.assert_allclose(
            np.asarray(out_fused[("disp", s)]),
            np.asarray(out_sep[("disp", s)]), rtol=2e-5, atol=2e-5)


def test_dense_plan_matches_grouped(separate_and_fused):
    """plan="dense" (block-diagonal dense convs, layers._DenseExpandConv)
    shares the grouped param tree and must reproduce its outputs exactly
    (off-diagonal kernel blocks are exact zeros)."""
    xolp, _, _, _, _, fused, vf = separate_and_fused
    vfj = jax.tree_util.tree_map(jnp.asarray, vf)
    ref = fused.apply(vfj, xolp)
    dense = FusedModalityEncoders(dropout_rate=0.0, plan="dense")
    got = dense.apply(vfj, xolp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    # a fresh dense init creates the SAME (grouped-shape) param tree
    vi = dense.init(jax.random.PRNGKey(0), xolp)
    ref_shapes = {jax.tree_util.keystr(p): np.asarray(x).shape
                  for p, x in jax.tree_util.tree_leaves_with_path(
                      vf["params"])}
    for p, x in jax.tree_util.tree_leaves_with_path(vi["params"]):
        k = jax.tree_util.keystr(p)
        assert k in ref_shapes and ref_shapes[k] == x.shape, (k, x.shape)


def test_teacher_paths_carry_fused_encoders():
    """VERDICT-r5 regression: the selfsup teacher and the student's teacher
    must run the production fused-encoder plan when the config asks for it
    (round-4 shipped the fused default for build_model only — the
    SelfSupModel/StudentModel constructors silently dropped it)."""
    from polardepth_tpu.config import Config
    from polardepth_tpu.train.selfsup import SelfSupModel
    from polardepth_tpu.train.student import StudentModel

    cfg = Config(height=64, width=96, batch_size=1, fused_encoders=True,
                 num_depth_bins=8, use_pallas=False)
    m = SelfSupModel.from_config(cfg, dropout_rate=0.0)
    assert m.fused_encoders and m.fused_plan == cfg.fused_plan
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 96, 3)), jnp.float32)
    pol = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 4)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, frames, pol)
    assert "fused_encoders" in v["params"]["mono"]
    assert "xolp_encoder" not in v["params"]["mono"]

    sm = StudentModel.from_config(cfg, dropout_rate=0.0)
    assert sm.fused_encoders and sm.remat == cfg.student_remat
    lookup = frames[:, 1:2]
    poses = jnp.eye(4)[None, None].astype(jnp.float32)
    K = jnp.eye(4)[None].astype(jnp.float32)
    vs = sm.init({"params": jax.random.PRNGKey(2),
                  "dropout": jax.random.PRNGKey(3)},
                 frames, pol, lookup, poses, K, K, 0.1, 20.0)
    assert "fused_encoders" in vs["params"]["teacher"]["mono"]
    # single-modality configs auto-disable fusion instead of erroring
    rgb_cfg = cfg.replace(augment_xolp=False, augment_normals=False)
    assert not SelfSupModel.from_config(rgb_cfg).fused_encoders
