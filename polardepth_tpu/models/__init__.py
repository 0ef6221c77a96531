"""Flax model zoo: the multi-encoder polarimetric depth network family.

TPU-native re-designs of the reference's nn.Modules
(manydepth/networks/*.py): NHWC layout, MXU-friendly convolutions, explicit
train flags for BatchNorm/Dropout, no Python-loop control flow.
"""

from polardepth_tpu.models.layers import (
    ReflectConv, ConvBlockELU, ConvBNReLUDrop, ResidualBlock,
)
from polardepth_tpu.models.resnet import (
    ResNet18Encoder, ShallowResNet18Stem, RESNET_NUM_CH_ENC,
)
from polardepth_tpu.models.pre_encoders import (
    ShallowEncoder, ShallowNormalsEncoder, JointEncoder,
)
from polardepth_tpu.models.depth_decoder import DepthDecoder
from polardepth_tpu.models.pose import PoseDecoder, PoseCNN
from polardepth_tpu.models.network import PolarDepthNet
