"""Teacher-student (ManyDepth) path: one train step end-to-end on synthetic
multi-frame data, augmentation masks, tracker EMA, teacher freezing."""

import numpy as np
import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.data.synthetic import SyntheticHammer
from polardepth_tpu.train.student import (
    StudentModel, make_student_train_step, matching_augmentation,
    update_depth_bin_trackers,
)
from polardepth_tpu.train.state import create_train_state

H, W = 32, 32


def _cfg(**kw):
    base = dict(height=H, width=W, batch_size=2, dropout_rate=0.0,
                depth_supervision=False, depth_supervision_only=False,
                train_student=True, no_matching_augmentation=False,
                mesh_shape=(1,))
    base.update(kw)
    return Config(**base)


def test_matching_augmentation_masks():
    rng = np.random.default_rng(0)
    cf = jnp.asarray(rng.uniform(0, 1, (8, 3, H, W, 3)).astype(np.float32))
    lf = cf[:, 1:2]
    poses = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32),
                                        (8, 1, 4, 4)))
    lookup, rel, mask, zeroed = matching_augmentation(
        jax.random.PRNGKey(3), cf, lf, poses)
    assert lookup.shape == lf.shape and rel.shape == poses.shape
    m = np.asarray(mask)[:, 0, 0, 0]
    static = np.asarray(jnp.all(lookup == cf[:, 0:1], axis=(1, 2, 3, 4)))
    zeroed_rel = np.asarray(jnp.all(rel == 0, axis=(1, 2, 3)))
    np.testing.assert_array_equal(np.asarray(zeroed), zeroed_rel)
    # every augmented sample is flagged, unaugmented ones untouched
    np.testing.assert_array_equal(m > 0, static | zeroed_rel)


def test_tracker_ema():
    d = jnp.full((2, 4, 4, 1), 1.0)
    mn, mx = update_depth_bin_trackers(jnp.float32(0.1), jnp.float32(2.0), d,
                                       0.1)
    np.testing.assert_allclose(float(mn), 0.1 * 0.99 + 0.9 * 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(mx), 2.0 * 0.99 + 1.1 * 0.01, rtol=1e-5)


def test_student_train_step_runs():
    cfg = _cfg()
    model = StudentModel(dropout_rate=0.0, num_depth_bins=16,
                         scales=tuple(cfg.scales))
    rng = jax.random.PRNGKey(0)
    gen = SyntheticHammer(H, W, seed=4)
    batch = gen.batch_frames(cfg.batch_size, frame_ids=cfg.frame_ids,
                             offset=2)
    example = {
        "color_frames": jnp.zeros((1, 3, H, W, 3), jnp.float32),
        "pol": jnp.zeros((1, H, W, 4), jnp.float32),
        "lookup_frames": jnp.zeros((1, 1, H, W, 3), jnp.float32),
        "rel_poses": jnp.zeros((1, 1, 4, 4), jnp.float32),
        "K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "inv_K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "min_depth_bin": 0.1, "max_depth_bin": 2.0,
    }
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    for name in ("teacher", "encoder", "depth"):
        assert name in state.params, state.params.keys()

    step = jax.jit(make_student_train_step(model, cfg))
    trackers = (jnp.float32(cfg.min_depth), jnp.float32(cfg.max_depth))
    losses = []
    for _ in range(2):
        state, trackers, logs = step(state, trackers, batch, rng)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert "consistency_loss/0" in logs and "mono_loss" in logs
    # trackers moved toward the mono depth range
    assert float(trackers[0]) != cfg.min_depth

    # frozen-teacher variant compiles and keeps trackers fixed
    step_frozen = jax.jit(make_student_train_step(model, cfg,
                                                  freeze_teacher=True))
    state2, trackers2, logs2 = step_frozen(state, trackers, batch, rng)
    assert np.isfinite(float(logs2["loss"]))
    np.testing.assert_allclose(np.asarray(trackers2), np.asarray(trackers))


def test_student_data_parallel_8_devices_matches_single():
    """The heaviest graph (teacher + cost-volume student) must give the
    same loss with its batch sharded over 8 devices as on 1 device —
    dropout/jitter PRNG, BN statistics, depth-bin trackers and the
    plane-sweep all under data-parallel sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from polardepth_tpu.parallel.mesh import create_mesh

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    cfg = _cfg(batch_size=8)
    model = StudentModel(dropout_rate=0.0, num_depth_bins=16,
                         scales=tuple(cfg.scales))
    rng = jax.random.PRNGKey(0)
    gen = SyntheticHammer(H, W, seed=6)
    batch = gen.batch_frames(8, frame_ids=cfg.frame_ids, offset=2)
    batch["inv_K"] = np.linalg.inv(batch["K"]).astype(np.float32)
    example = {
        "color_frames": jnp.zeros((1, 3, H, W, 3), jnp.float32),
        "pol": jnp.zeros((1, H, W, 4), jnp.float32),
        "lookup_frames": jnp.zeros((1, 1, H, W, 3), jnp.float32),
        "rel_poses": jnp.zeros((1, 1, 4, 4), jnp.float32),
        "K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "inv_K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "min_depth_bin": 0.1, "max_depth_bin": 2.0,
    }
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    step = jax.jit(make_student_train_step(model, cfg))
    trackers = (jnp.float32(cfg.min_depth), jnp.float32(cfg.max_depth))

    results = {}
    for n in (1, 8):
        mesh = create_mesh((n,))
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        st = jax.device_put(state, repl)
        tr = jax.device_put(trackers, repl)
        db = {k: jax.device_put(v, data) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
        st, tr, logs = step(st, tr, db, rng)
        results[n] = (float(logs["loss"]), float(tr[0]), float(tr[1]))
    # rtol: the loss mean reduces over devices via psum of partial sums and
    # the per-shard gather fusions reassociate float adds differently, so
    # 1-vs-8-device equality is expected only to a few ulps of the
    # accumulated reductions (measured 1.6e-4 relative on a 0.04 loss)
    np.testing.assert_allclose(results[1], results[8], rtol=5e-4)
