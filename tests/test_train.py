"""End-to-end training tests on synthetic data: loss decreases (the
reference's own overfit smoke-test protocol, options.py:205-212), eval tables,
checkpoint round-trip, and data-parallel sharding over the 8 virtual devices."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.data.synthetic import SyntheticHammer
from polardepth_tpu.parallel.mesh import create_mesh
from polardepth_tpu.train.trainer import Trainer
from polardepth_tpu.train import checkpoint as ckpt

H, W = 32, 32


def tiny_config(**kw):
    base = dict(height=H, width=W, batch_size=2, dropout_rate=0.0,
                num_epochs=2, mesh_shape=(1,), donate_state=False)
    base.update(kw)
    return Config(**base)


def _gen(cfg, n_batches=2, seed=0):
    gen = SyntheticHammer(cfg.height, cfg.width, seed=seed)
    return [gen.batch(cfg.batch_size, start=i * cfg.batch_size)
            for i in range(n_batches)]


@pytest.fixture(scope="module")
def overfit_setup():
    cfg = tiny_config()
    trainer = Trainer(cfg, steps_per_epoch=1, log_fn=lambda *_: None)
    batch = _gen(cfg, 1)[0]
    return cfg, trainer, batch


def test_overfit_single_batch_loss_decreases(overfit_setup):
    cfg, trainer, batch = overfit_setup
    losses = []
    for _ in range(8):
        logs = trainer.train_epoch([batch])
        losses.append(logs["loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_eval_produces_material_table(overfit_setup):
    cfg, trainer, batch = overfit_setup
    results = trainer.evaluate([batch])
    assert "all" in results and "glass" in results and "objects" in results
    assert results["all"]["frames"] == cfg.batch_size
    for m in ("abs_rel", "rmse", "a1"):
        assert np.isfinite(results["all"][m])
    # a1 is a fraction
    assert 0.0 <= results["all"]["a1"] <= 1.0


def test_predict_shape_and_range(overfit_setup):
    cfg, trainer, batch = overfit_setup
    depth = trainer.predict(batch)
    assert depth.shape == (cfg.batch_size, H, W, 1)
    assert depth.min() >= cfg.min_depth - 1e-5
    assert depth.max() <= cfg.max_depth + 1e-5


def test_checkpoint_roundtrip(tmp_path, overfit_setup):
    cfg, trainer, batch = overfit_setup
    path = ckpt.save(str(tmp_path), trainer.state, cfg)
    pred_before = trainer.predict(batch)
    # clone trainer, restore, verify identical predictions
    t2 = Trainer(cfg, steps_per_epoch=1, log_fn=lambda *_: None)
    t2.state = ckpt.restore(path, t2.state)
    np.testing.assert_allclose(t2.predict(batch), pred_before,
                               rtol=1e-5, atol=1e-6)
    assert ckpt.latest_step_dir(str(tmp_path)) == path


def test_component_export_import(tmp_path, overfit_setup):
    cfg, trainer, batch = overfit_setup
    comp_dir = str(tmp_path / "components")
    files = ckpt.export_components(comp_dir, trainer.state)
    names = {f.split("/")[-1] for f in files}
    assert {"rgb_encoder.npz", "xolp_encoder.npz", "normals_encoder.npz",
            "joint_encoder.npz", "mono_depth.npz"} <= names
    t2 = Trainer(cfg, steps_per_epoch=1, log_fn=lambda *_: None)
    t2.state = ckpt.import_components(comp_dir, t2.state)
    np.testing.assert_allclose(t2.predict(batch), trainer.predict(batch),
                               rtol=1e-5, atol=1e-6)


def test_component_export_crosses_execution_plans(tmp_path, overfit_setup):
    """A fused-encoder state's component export is reference-shaped, so an
    UNFUSED model must be able to import it and predict identically."""
    cfg, trainer, batch = overfit_setup
    assert "fused_encoders" in trainer.state.params  # fused is the default
    comp_dir = str(tmp_path / "components")
    ckpt.export_components(comp_dir, trainer.state)
    t2 = Trainer(cfg.replace(fused_encoders=False), steps_per_epoch=1,
                 log_fn=lambda *_: None)
    assert "xolp_encoder" in t2.state.params
    t2.state = ckpt.import_components(comp_dir, t2.state)
    np.testing.assert_allclose(t2.predict(batch), trainer.predict(batch),
                               rtol=1e-5, atol=1e-6)


def test_rgb_only_config_trains():
    cfg = tiny_config(augment_xolp=False, augment_normals=False)
    trainer = Trainer(cfg, steps_per_epoch=1, log_fn=lambda *_: None)
    batch = _gen(cfg, 1)[0]
    logs = trainer.train_epoch([batch])
    assert np.isfinite(logs["loss"])
    assert "xolp_encoder" not in trainer.state.params


def test_data_parallel_8_devices_matches_single_device():
    """The same batch must give the same loss on a 1-device and an 8-device
    mesh (BN/statistics are global-batch under sharding)."""
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    cfg = tiny_config(batch_size=8)
    batch = _gen(cfg, 1)[0]

    t1 = Trainer(cfg, steps_per_epoch=1, mesh=create_mesh((1,)),
                 log_fn=lambda *_: None)
    t8 = Trainer(cfg, steps_per_epoch=1, mesh=create_mesh((8,)),
                 log_fn=lambda *_: None)
    l1 = t1.train_epoch([batch])["loss"]
    l8 = t8.train_epoch([batch])["loss"]
    np.testing.assert_allclose(l1, l8, rtol=1e-4)
    # Post-step parameters: Adam's first step is update = -lr * g/(|g|+eps),
    # so coordinates with g ~ 0 amplify cross-device f32 reduction-order
    # noise to +-lr.  A 2*lr atol still catches any real sharding bug
    # (which diverges at O(weight) scale), without flaking on sign flips.
    lr = cfg.learning_rate
    p1 = jax.tree_util.tree_leaves(jax.device_get(t1.state.params))
    p8 = jax.tree_util.tree_leaves(jax.device_get(t8.state.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=2.0 * lr)


def test_multi_step_scan_matches_sequential(overfit_setup):
    """N steps in one lax.scan call must be numerically identical to N
    sequential train-step calls (the PRNG folds on state.step, which
    advances inside the scan)."""
    cfg, _, batch = overfit_setup
    t_seq = Trainer(cfg, steps_per_epoch=1, log_fn=lambda *_: None)
    t_scan = Trainer(cfg, steps_per_epoch=1, log_fn=lambda *_: None)
    batches = [batch, batch, batch]
    l_seq = t_seq.train_epoch(list(batches), steps_per_call=1)["loss"]
    l_scan = t_scan.train_epoch(list(batches), steps_per_call=3)["loss"]
    # The scan body compiles separately from the single step, so f32
    # rounding differs and Adam's early steps amplify near-zero-grad
    # coordinates to +-lr (see the 8-device test comment); losses must agree
    # tightly and params within the Adam amplification bound.
    np.testing.assert_allclose(l_seq, l_scan, rtol=1e-2)
    p1 = jax.tree_util.tree_leaves(jax.device_get(t_seq.state.params))
    p2 = jax.tree_util.tree_leaves(jax.device_get(t_scan.state.params))
    for a, b in zip(p1, p2):
        # bound grows ~lr per Adam step taken
        np.testing.assert_allclose(a, b, rtol=1e-2,
                                   atol=4.0 * cfg.learning_rate)
    assert int(t_seq.state.step) == int(t_scan.state.step) == 3


# -- checkpointable input iterator (exact mid-epoch data resume) -------------

from polardepth_tpu.data.pipeline import BatchIterator


def _index_iterator(n=8, bs=2, seed=7, workers=1):
    """BatchIterator whose batches carry their sample indices."""
    return BatchIterator(lambda i: {"idx": np.array([i])}, n, bs,
                         shuffle=True, seed=seed, num_workers=workers)


def _drain(it, k=None):
    out = []
    for b in it:
        out.append(tuple(int(x) for x in b["idx"].ravel()))
        if k is not None and len(out) >= k:
            break
    return out


def test_batch_iterator_exact_resume_mid_epoch():
    ref = _index_iterator()
    full = _drain(iter(ref)) + _drain(iter(ref))  # two epochs

    it = _index_iterator()
    head = _drain(iter(it), k=3)  # consume 3 batches, abandon the generator
    snap = it.state()
    assert snap == {"seed": 7, "epoch": 0, "cursor": 3}

    fresh = _index_iterator()
    fresh.set_state(snap)
    tail = _drain(iter(fresh)) + _drain(iter(fresh))
    assert head + tail == full


def test_batch_iterator_partial_pull_does_not_shift_epochs():
    """A single-batch validation pull (next(iter(...))) must not change the
    sequence later full passes yield."""
    ref = _index_iterator()
    e0, e1 = _drain(iter(ref)), _drain(iter(ref))

    it = _index_iterator()
    a = _drain(iter(it))
    next(iter(it))  # abandoned partial pass
    b = _drain(iter(it))
    assert (a, b) == (e0, e1)


def test_batch_iterator_seed_mismatch_rejected():
    it = _index_iterator(seed=7)
    with pytest.raises(ValueError):
        it.set_state({"seed": 8, "epoch": 0, "cursor": 1})


def test_fit_kill_resume_identical_batch_sequence(tmp_path):
    """Kill a fit() mid-epoch, resume from the checkpoint in a fresh process
    state: the consumed batch sequence across kill+resume must equal an
    uninterrupted run's, and the final parameters must match."""
    cfg = tiny_config(num_epochs=2, save_frequency=10)
    gen = SyntheticHammer(cfg.height, cfg.width, seed=0)
    n_samples, spe = 8, 4  # batch 2 -> 4 steps/epoch

    def make_iter(log, bomb_at=None):
        calls = {"n": 0}

        def load(i):
            if bomb_at is not None and calls["n"] >= bomb_at:
                raise KeyboardInterrupt("simulated preemption")
            calls["n"] += 1
            log.append(int(i))
            return {k: v[0] for k, v in gen.batch(1, start=int(i)).items()}

        return BatchIterator(load, n_samples, cfg.batch_size,
                             shuffle=True, seed=cfg.seed, num_workers=1)

    # uninterrupted reference run
    ref_log = []
    t_ref = Trainer(cfg, steps_per_epoch=spe, log_fn=lambda *_: None)
    t_ref.fit(make_iter(ref_log), num_epochs=2)
    assert int(t_ref.state.step) == 8

    # interrupted run: dies while loading the 4th batch (after 3 trained)
    ckdir = str(tmp_path / "ck")
    log1 = []
    t1 = Trainer(cfg, steps_per_epoch=spe, log_fn=lambda *_: None)
    with pytest.raises(KeyboardInterrupt):
        t1.fit(make_iter(log1, bomb_at=3 * cfg.batch_size), num_epochs=2,
               checkpoint_dir=ckdir, save_every_steps=1)
    assert len(log1) == 3 * cfg.batch_size

    # resume in a fresh trainer + fresh iterator
    log2 = []
    t2 = Trainer(cfg, steps_per_epoch=spe, log_fn=lambda *_: None)
    t2.fit(make_iter(log2), num_epochs=2, checkpoint_dir=ckdir,
           save_every_steps=1)
    assert int(t2.state.step) == 8
    assert log1 + log2 == ref_log

    p_ref = jax.tree_util.tree_leaves(jax.device_get(t_ref.state.params))
    p_res = jax.tree_util.tree_leaves(jax.device_get(t2.state.params))
    for a, b in zip(p_ref, p_res):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_multi_eval_equals_sequential_eval():
    """evaluate(batches_per_call=N) must produce the identical metric table
    to per-batch dispatch — the scan only groups dispatches."""
    import jax
    from polardepth_tpu.config import Config
    from polardepth_tpu.data.synthetic import SyntheticHammer
    from polardepth_tpu.train.trainer import Trainer

    cfg = Config(height=32, width=32, batch_size=2, dropout_rate=0.0,
                 mesh_shape=(1,))
    gen = SyntheticHammer(32, 32, seed=9)
    batches = [gen.batch(2, start=2 * i) for i in range(5)]  # 5 = 2x2 + 1
    trainer = Trainer(cfg, steps_per_epoch=1, log_fn=lambda *_: None)
    seq = trainer.evaluate(iter(batches), batches_per_call=1)
    grp = trainer.evaluate(iter(batches), batches_per_call=2)
    for sl in seq:
        for m, v in seq[sl].items():
            assert abs(v - grp[sl][m]) < 1e-5, (sl, m, v, grp[sl][m])
