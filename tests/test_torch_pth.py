"""Torch-free .pth reader tests: the fixture checkpoints are emitted by the
real torch (cpu, available in the test environment only) and read back by
polardepth_tpu.utils.torch_pth without importing torch."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from polardepth_tpu.utils.torch_pth import (  # noqa: E402
    load_pth, load_state_dict, load_array_dict)


def test_roundtrip_dtypes_shapes_strides(tmp_path):
    rng = np.random.default_rng(0)
    sd = {
        "w32": torch.from_numpy(rng.normal(size=(4, 3, 3, 3))
                                .astype(np.float32)),
        "w64": torch.from_numpy(rng.normal(size=(5,)).astype(np.float64)),
        "w16": torch.from_numpy(rng.normal(size=(2, 7)).astype(np.float16)),
        "i64": torch.arange(6, dtype=torch.int64).reshape(2, 3),
        "u8": torch.from_numpy(rng.integers(0, 255, (3, 4), dtype=np.uint8)),
        "flag": torch.tensor([True, False, True]),
        "scalar": torch.tensor(3.5),
        # non-contiguous: exercises the stride-aware rebuild
        "transposed": torch.from_numpy(
            rng.normal(size=(4, 6)).astype(np.float32)).t(),
        # shares storage with an offset: exercises storage_offset
        "offset_view": torch.from_numpy(
            rng.normal(size=(10,)).astype(np.float32))[3:8],
    }
    path = str(tmp_path / "fixture.pth")
    torch.save(sd, path)
    out = load_state_dict(path)
    assert set(out) == set(sd)
    for k, v in sd.items():
        got = out[k]
        want = v.detach().numpy()
        assert got.dtype == want.dtype, k
        assert got.shape == want.shape, k
        np.testing.assert_array_equal(got, want, err_msg=k)


def test_non_tensor_entries_pass_through(tmp_path):
    """The reference stuffs height/width/min/max_depth_bin ints+floats into
    the matching encoder's state_dict (trainer.py:1608-1613)."""
    sd = {"weight": torch.zeros(2, 2), "height": 320, "width": 480,
          "min_depth_bin": 0.1}
    path = str(tmp_path / "enc.pth")
    torch.save(sd, path)
    out = load_state_dict(path)
    assert out["height"] == 320 and out["min_depth_bin"] == 0.1
    arrays = load_array_dict(path)
    assert set(arrays) == {"weight"}  # non-tensors dropped


def test_nested_checkpoint_and_parameter(tmp_path):
    lin = torch.nn.Linear(3, 2)
    torch.save({"state_dict": lin.state_dict()}, str(tmp_path / "ckpt.pth"))
    out = load_state_dict(str(tmp_path / "ckpt.pth"))
    np.testing.assert_array_equal(out["weight"],
                                  lin.weight.detach().numpy())
    # nn.Parameter values inside a raw dict also load
    torch.save({"p": lin.weight}, str(tmp_path / "param.pth"))
    out2 = load_state_dict(str(tmp_path / "param.pth"))
    np.testing.assert_array_equal(out2["p"], lin.weight.detach().numpy())


def test_refuses_arbitrary_code(tmp_path):
    import fractions
    torch.save({"x": fractions.Fraction(1, 3)}, str(tmp_path / "evil.pth"))
    with pytest.raises(Exception, match="refusing to load"):
        load_pth(str(tmp_path / "evil.pth"))


def test_non_zip_rejected(tmp_path):
    p = tmp_path / "legacy.pth"
    p.write_bytes(b"\x80\x02not a zip")
    with pytest.raises(ValueError, match="zip-format"):
        load_pth(str(p))


def _fake_resnet18_state_dict(rng):
    """torchvision-resnet18-shaped random state_dict (keys + shapes)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (o, i, k, k)).astype(np.float32))

    def bn(name, c):
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{name}.running_mean"] = torch.from_numpy(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{name}.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{name}.num_batches_tracked"] = torch.tensor(7)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = {"layer1": (64, 64), "layer2": (64, 128),
             "layer3": (128, 256), "layer4": (256, 512)}
    for layer, (cin, cout) in chans.items():
        for b in range(2):
            i = cin if b == 0 else cout
            conv(f"{layer}.{b}.conv1", cout, i, 3)
            bn(f"{layer}.{b}.bn1", cout)
            conv(f"{layer}.{b}.conv2", cout, cout, 3)
            bn(f"{layer}.{b}.bn2", cout)
            if b == 0 and layer != "layer1":
                conv(f"{layer}.{b}.downsample.0", cout, cin, 1)
                bn(f"{layer}.{b}.downsample.1", cout)
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def test_load_torch_resnet18_from_pth_directly(tmp_path):
    """weights_init=pretrained straight from a torchvision-format .pth — no
    offline npz conversion machine needed (VERDICT r2 item 4a)."""
    from polardepth_tpu.models.resnet import load_torch_resnet18
    rng = np.random.default_rng(3)
    sd = _fake_resnet18_state_dict(rng)
    path = str(tmp_path / "resnet18.pth")
    torch.save(sd, path)
    params, stats = load_torch_resnet18(path, shallow=True)
    k = np.asarray(params["Conv_0"]["kernel"])
    assert k.shape == (7, 7, 3, 64)  # OIHW -> HWIO
    np.testing.assert_allclose(
        k, sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(stats["BatchNorm_0"]["var"]),
                               sd["bn1.running_var"].numpy())
    # full encoder + 2-frame conv1 tiling (pose encoder init)
    p2, _ = load_torch_resnet18(path, shallow=False, num_input_images=2)
    k2 = np.asarray(p2["Conv_0"]["kernel"])
    assert k2.shape == (7, 7, 6, 64)
    np.testing.assert_allclose(k2[..., :3, :], k / 2, rtol=1e-6)
