"""Pretrained-weight conversion: a synthetic torch-format resnet18
state_dict must load into the flax encoders with exact tree/shape agreement
and actually drive the forward pass."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polardepth_tpu.models.resnet import (
    ShallowResNet18Stem, ResNet18Encoder, load_torch_resnet18,
)


def _fake_state_dict(rng, shallow=False):
    """Random arrays with torchvision resnet18 names/shapes (OIHW)."""
    d = {}

    def conv(name, o, i, k):
        d[name] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    def bn(prefix, c):
        d[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        d[f"{prefix}.bias"] = rng.uniform(-0.1, 0.1, c).astype(np.float32)
        d[f"{prefix}.running_mean"] = rng.uniform(-0.1, 0.1, c).astype(np.float32)
        d[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    layers = [("layer1", 64, 64, False), ("layer2", 128, 64, True)]
    if not shallow:
        layers += [("layer3", 256, 128, True), ("layer4", 512, 256, True)]
    for name, c, c_in, down in layers:
        for b in range(2):
            i0 = c_in if b == 0 else c
            conv(f"{name}.{b}.conv1.weight", c, i0, 3)
            bn(f"{name}.{b}.bn1", c)
            conv(f"{name}.{b}.conv2.weight", c, c, 3)
            bn(f"{name}.{b}.bn2", c)
            if b == 0 and down:
                conv(f"{name}.{b}.downsample.0.weight", c, c_in, 1)
                bn(f"{name}.{b}.downsample.1", c)
    return d


@pytest.mark.parametrize("shallow", [True, False])
def test_torch_resnet18_conversion_tree_matches(tmp_path, shallow):
    rng = np.random.default_rng(0)
    sd = _fake_state_dict(rng, shallow)
    path = str(tmp_path / "r18.npz")
    np.savez(path, **sd)
    params, stats = load_torch_resnet18(path, shallow=shallow)

    model = ShallowResNet18Stem() if shallow else ResNet18Encoder()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ref_vars = model.init(jax.random.PRNGKey(0), x)

    # exact tree structure + shapes
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape,
                                        ref_vars["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    ref_stats = jax.tree_util.tree_map(lambda a: a.shape,
                                       ref_vars["batch_stats"])
    got_stats = jax.tree_util.tree_map(lambda a: a.shape, stats)
    assert ref_stats == got_stats

    # forward runs with the loaded weights and differs from scratch init
    out_loaded = model.apply({"params": params, "batch_stats": stats},
                             jnp.ones((1, 32, 32, 3)) * 0.5)
    out_scratch = model.apply(ref_vars, jnp.ones((1, 32, 32, 3)) * 0.5)
    last = out_loaded[-1] if isinstance(out_loaded, list) else out_loaded
    last_s = out_scratch[-1] if isinstance(out_scratch, list) else out_scratch
    assert np.isfinite(np.asarray(last)).all()
    assert not np.allclose(np.asarray(last), np.asarray(last_s))

    # OIHW -> HWIO transpose correctness on a known element
    k = np.asarray(params["Conv_0"]["kernel"])
    np.testing.assert_allclose(k[3, 2, 1, 5], sd["conv1.weight"][5, 1, 3, 2])
