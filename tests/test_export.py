"""Serving-export round trip: serialize the fused preprocess+infer graph
to StableHLO, deserialize, and get identical depth back at multiple batch
sizes through the symbolic batch dimension."""

import numpy as np
import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.data.synthetic import SyntheticHammer
from polardepth_tpu.eval.export import load_artifact, make_export, save_artifact
from polardepth_tpu.train.state import create_train_state
from polardepth_tpu.train.trainer import build_model, make_infer_step

H, W = 32, 64


def _state(cfg):
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, H, W, 3), jnp.float32),
               "pol": jnp.zeros((1, H, W, 4), jnp.float32)}
    return model, create_train_state(
        model, {"params": rng, "dropout": rng}, example, 1e-4)


def test_export_roundtrip_symbolic_batch(tmp_path):
    cfg = Config(height=H, width=W, batch_size=2, dropout_rate=0.0)
    model, state = _state(cfg)
    exp = make_export(cfg, state)  # symbolic batch
    path = str(tmp_path / "model.shlo")
    save_artifact(exp, path, cfg)
    assert (tmp_path / "model.shlo.json").exists()

    loaded = load_artifact(path)
    infer = jax.jit(make_infer_step(model, cfg))
    gen = SyntheticHammer(H, W, seed=2)
    for b in (1, 3):
        batch = gen.batch(b)
        got = np.asarray(loaded.call(batch["color"], batch["pol"]))
        want = np.asarray(infer(state, {"color": batch["color"],
                                        "pol": batch["pol"]}))
        assert got.shape == (b, H, W, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert got.min() >= cfg.min_depth - 1e-6
        assert got.max() <= cfg.max_depth + 1e-6


def test_export_rgb_only_graph(tmp_path):
    cfg = Config(height=H, width=W, batch_size=2, dropout_rate=0.0,
                 augment_xolp=False, augment_normals=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(1)
    example = {"color": jnp.zeros((1, H, W, 3), jnp.float32), "pol": None}
    from polardepth_tpu.train.state import create_train_state
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    exp = make_export(cfg, state, batch=2)
    loaded = jax.export.deserialize(exp.serialize())
    color = np.random.default_rng(0).integers(
        0, 255, (2, H, W, 3), dtype=np.uint8)
    out = np.asarray(loaded.call(color, None))
    assert out.shape == (2, H, W, 1)
    assert np.isfinite(out).all()


def test_export_dpt_graph(tmp_path):
    """cfg.train_dpt exports the DPT depth graph (uint8 color -> clipped
    depth) with the same round-trip guarantees as the flagship."""
    cfg = Config(height=H, width=W, batch_size=2, dropout_rate=0.0,
                 train_dpt=True, max_depth=2.0, dpt_backbone="vitb16")
    from polardepth_tpu.models.dpt import DPTDepthModel
    from polardepth_tpu.train.dpt_trainer import make_dpt_infer_step

    model = DPTDepthModel(backbone="vitb16")
    rng = jax.random.PRNGKey(3)
    example = {"x": jnp.zeros((1, H, W, 3), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    exp = make_export(cfg, state, batch=2)
    loaded = jax.export.deserialize(exp.serialize())
    batch = SyntheticHammer(H, W, seed=4).batch(2)
    got = np.asarray(loaded.call(batch["color"], None))
    infer = jax.jit(make_dpt_infer_step(model, cfg))
    want = np.asarray(infer(state, {"color": batch["color"]}))
    assert got.shape == (2, H, W, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.min() >= cfg.min_depth - 1e-6
    assert got.max() <= cfg.max_depth + 1e-6
