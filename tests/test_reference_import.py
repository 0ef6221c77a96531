"""End-to-end parity for reference weights_<epoch>/*.pth import.

Fixture checkpoints are emitted by torch oracles that replicate the
reference's module structure (pre_encoders.py ConvBlock/ResidualBlock/
ShallowEncoder/JointEncoder, depth_decoder.py, the torchvision resnet18
stem) with random weights AND random BN running statistics; the oracles'
forward pass (eval mode) is the golden output.  load_reference_components
grafts the .pth files into PolarDepthNet and the full tri-encoder forward
must match the torch pipeline elementwise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from polardepth_tpu.config import Config  # noqa: E402
from polardepth_tpu.models.network import PolarDepthNet  # noqa: E402
from polardepth_tpu.models.reference_import import (  # noqa: E402
    load_reference_components)

H, W, B = 64, 96, 2
XOLP_MEAN, XOLP_STD = 0.08693199701957657, 0.44430732785457433


# -- torch oracles (reference module structure, torch.nn only) ----------------

class TConvBlock(tnn.Module):
    """pre_encoders.py ConvBlock: conv -> bn -> relu -> [maxpool]."""

    def __init__(self, cin, cout, k, mode, pad):
        super().__init__()
        stride = 2 if mode == "stride2" else 1
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=pad)
        self.bn = tnn.BatchNorm2d(cout)
        self.mode = mode

    def forward(self, x):
        out = F.relu(self.bn(self.conv(x)))
        if self.mode == "maxpool":
            out = F.max_pool2d(out, 2)
        return out


class TResBlock(tnn.Module):
    def __init__(self, ch, k, pad):
        super().__init__()
        self.conv1 = TConvBlock(ch, ch, k, "none", pad)
        self.conv2 = TConvBlock(ch, ch, k, "none", pad)

    def forward(self, x):
        return self.conv2(self.conv1(x)) + x


class TShallowEncoder(tnn.Module):
    def __init__(self, cin, mode):
        super().__init__()
        self.mode = mode
        self.Conv1 = TConvBlock(cin, 64, 7, "stride2", 3)
        self.ResBlock1 = TResBlock(64, 3, 1)
        self.Conv2 = TConvBlock(64, 64, 5, "maxpool", 2)
        self.ResBlock2 = TResBlock(64, 3, 1)
        self.Conv3 = TConvBlock(64, 64, 5, "maxpool", 2)
        self.ResBlock3 = TResBlock(64, 3, 1)

    def forward(self, x):
        if self.mode == "XOLP":
            x = (x - XOLP_MEAN) / XOLP_STD
        for m in (self.Conv1, self.ResBlock1, self.Conv2, self.ResBlock2,
                  self.Conv3, self.ResBlock3):
            x = m(x)
        return x


class TJointEncoder(tnn.Module):
    def __init__(self, extra=128):
        super().__init__()
        self.fc1 = TConvBlock(128 + extra, 256, 1, "none", 0)
        self.fc2 = TConvBlock(256, 128, 1, "none", 0)
        self.ResBlock1 = TResBlock(128, 3, 1)
        self.ResBlock2 = TResBlock(128, 3, 1)
        self.Conv1 = TConvBlock(128, 256, 5, "maxpool", 2)
        self.ResBlock3 = TResBlock(256, 3, 1)
        self.ResBlock4 = TResBlock(256, 3, 1)
        self.Conv2 = TConvBlock(256, 512, 5, "maxpool", 2)
        self.ResBlock5 = TResBlock(512, 3, 1)
        self.ResBlock6 = TResBlock(512, 3, 1)

    def forward(self, rgb, xolp, normals):
        x = torch.cat([rgb, xolp, normals], dim=1)
        x = self.ResBlock2(self.ResBlock1(self.fc2(self.fc1(x))))
        x = self.ResBlock4(self.ResBlock3(self.Conv1(x)))
        out16 = x
        x = self.ResBlock6(self.ResBlock5(self.Conv2(x)))
        return out16, x


class TConv3x3(tnn.Module):
    """layers.py Conv3x3: reflection pad + 3x3 valid conv."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return self.conv(F.pad(x, (1, 1, 1, 1), mode="reflect"))


class TDecoderBlock(tnn.Module):
    """layers.py ConvBlock: Conv3x3 + ELU."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConv3x3(cin, cout)

    def forward(self, x):
        return F.elu(self.conv(x))


class TDepthDecoder(tnn.Module):
    NUM_CH_DEC = (16, 32, 64, 128, 256)
    NUM_CH_ENC = (64, 64, 128, 256, 512)

    def __init__(self, scales=(0, 1, 2, 3)):
        super().__init__()
        self.scales = scales
        mods = []
        for i in range(4, -1, -1):
            cin = self.NUM_CH_ENC[-1] if i == 4 else self.NUM_CH_DEC[i + 1]
            mods.append(TDecoderBlock(cin, self.NUM_CH_DEC[i]))
            cin = self.NUM_CH_DEC[i] + (self.NUM_CH_ENC[i - 1] if i > 0
                                        else 0)
            mods.append(TDecoderBlock(cin, self.NUM_CH_DEC[i]))
        for s in scales:
            mods.append(TConv3x3(self.NUM_CH_DEC[s], 1))
        self.decoder = tnn.ModuleList(mods)

    def forward(self, feats):
        outs = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = self.decoder[(4 - i) * 2](x)
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
            if i > 0:
                x = torch.cat([x, feats[i - 1]], dim=1)
            x = self.decoder[(4 - i) * 2 + 1](x)
            if i in self.scales:
                outs[i] = torch.sigmoid(
                    self.decoder[10 + list(self.scales).index(i)](x))
        return outs


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        return F.relu(out + idt)


class TResNet18(tnn.Module):
    """torchvision-resnet18-shaped module (state_dict keys match)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for li, (cin, cout, stride) in enumerate(chans):
            setattr(self, f"layer{li + 1}", tnn.Sequential(
                TBasicBlock(cin, cout, stride), TBasicBlock(cout, cout, 1)))
        self.fc = tnn.Linear(512, 1000)

    def shallow_forward(self, x):
        """ShallowResnetEncoder.forward (resnet_encoder.py:809-822)."""
        x = (x - 0.45) / 0.225
        f0 = F.relu(self.bn1(self.conv1(x)))
        f1 = self.layer1(F.max_pool2d(f0, 3, 2, 1))
        f2 = self.layer2(f1)
        return [f0, f1, f2]


class TRgbEncoderWrapper(tnn.Module):
    """ShallowResnetEncoder state_dict layout: everything under 'encoder.'"""

    def __init__(self):
        super().__init__()
        self.encoder = TResNet18()


def _randomize(module, rng):
    """Random weights + BN running stats so eval-mode BN is exercised."""
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.from_numpy(
                rng.normal(0, 0.08, p.shape).astype(np.float32)))
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.05, m.running_mean.shape)
                    .astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.8, 1.2, m.running_var.shape)
                    .astype(np.float32)))


@pytest.fixture(scope="module")
def reference_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("weights_47")
    rng = np.random.default_rng(11)
    oracles = {
        "rgb_encoder": TRgbEncoderWrapper(),
        "xolp_encoder": TShallowEncoder(2, "XOLP"),
        "normals_encoder": TShallowEncoder(9, "normals"),
        "joint_encoder": TJointEncoder(),
        "mono_depth": TDepthDecoder(),
    }
    for name, mod in oracles.items():
        _randomize(mod, rng)
        mod.eval()
        torch.save(mod.state_dict(), str(d / f"{name}.pth"))
    return str(d), oracles


def test_full_forward_parity_with_reference_checkpoint(reference_checkpoint):
    weights_dir, oracles = reference_checkpoint
    rngs = np.random.default_rng(5)
    color = rngs.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    xolp = np.stack([rngs.uniform(0, 0.9, (B, H, W)),
                     rngs.uniform(-np.pi / 2, np.pi / 2, (B, H, W))],
                    axis=-1).astype(np.float32)

    # ---- ours: init, graft, forward -------------------------------------
    model = PolarDepthNet(dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.asarray(color), xolp=jnp.asarray(xolp))
    p, s, loaded = load_reference_components(
        weights_dir, dict(variables["params"]),
        dict(variables["batch_stats"]), log=lambda *_: None)
    assert set(loaded) == {"rgb_encoder", "xolp_encoder", "normals_encoder",
                           "joint_encoder", "mono_depth"}
    outs = model.apply({"params": p, "batch_stats": s},
                       jnp.asarray(color), xolp=jnp.asarray(xolp),
                       train=False)

    # ---- torch oracle pipeline ------------------------------------------
    from polardepth_tpu.ops.fresnel import normal_priors_from_xolp
    priors = np.asarray(normal_priors_from_xolp(jnp.asarray(xolp), 1.5))

    def t(x):  # NHWC -> NCHW torch
        return torch.from_numpy(np.ascontiguousarray(
            x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        f0, f1, f2 = oracles["rgb_encoder"].encoder.shallow_forward(t(color))
        xf = oracles["xolp_encoder"](t(xolp))
        nf = oracles["normals_encoder"](t(priors))
        j16, j32 = oracles["joint_encoder"](f2, xf, nf)
        want = oracles["mono_depth"]([f0, f1, f2, j16, j32])

    for sscale in (0, 1, 2, 3):
        got = np.asarray(outs[("disp", sscale)])[..., 0]
        ref = want[sscale].numpy()[:, 0]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=f"scale {sscale}")


def test_import_rejects_shape_mismatch(reference_checkpoint):
    weights_dir, _ = reference_checkpoint
    model = PolarDepthNet(dropout_rate=0.0, augment_xolp=False,
                          augment_normals=True)  # joint fc1 is 128+64 wide
    key = jax.random.PRNGKey(0)
    xolp = jnp.zeros((1, H, W, 2))
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, H, W, 3)), xolp=xolp)
    with pytest.raises(ValueError, match="shapes do not match"):
        load_reference_components(weights_dir, dict(variables["params"]),
                                  dict(variables["batch_stats"]),
                                  log=lambda *_: None)


def test_fused_model_loads_reference_checkpoint(reference_checkpoint):
    """Round-5 regression: the shipped default model has a fused_encoders
    subtree instead of xolp/normals_encoder — loading the reference's
    per-component .pth files must fuse them in (NOT silently skip them,
    which would evaluate random modality encoders)."""
    weights_dir, _ = reference_checkpoint
    rngs = np.random.default_rng(6)
    color = rngs.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    xolp = np.stack([rngs.uniform(0, 0.9, (B, H, W)),
                     rngs.uniform(-np.pi / 2, np.pi / 2, (B, H, W))],
                    axis=-1).astype(np.float32)
    key = jax.random.PRNGKey(0)

    def load_into(model):
        variables = model.init({"params": key, "dropout": key},
                               jnp.asarray(color), xolp=jnp.asarray(xolp))
        p, s, loaded = load_reference_components(
            weights_dir, dict(variables["params"]),
            dict(variables["batch_stats"]), log=lambda *_: None)
        assert {"xolp_encoder", "normals_encoder"} <= set(loaded)
        return model.apply({"params": p, "batch_stats": s},
                           jnp.asarray(color), xolp=jnp.asarray(xolp),
                           train=False)

    sep = load_into(PolarDepthNet(dropout_rate=0.0))
    fused = load_into(PolarDepthNet(dropout_rate=0.0, fused_encoders=True,
                                    fused_plan="dense"))
    for sscale in (0, 1, 2, 3):
        np.testing.assert_allclose(
            np.asarray(fused[("disp", sscale)]),
            np.asarray(sep[("disp", sscale)]),
            rtol=2e-5, atol=2e-5, err_msg=f"scale {sscale}")
