"""Data subsystem: HAMMER dataset indexing/loading, synthetic fixtures, and
the host->device input pipeline.

Division of labour (the north-star "no host round-trips" design, SURVEY §7):
the host only decodes PNGs and assembles uint8/uint16 batches; float
conversion, resizing, color jitter, XOLP and Fresnel normals all run on
device inside the jitted step.
"""

from polardepth_tpu.data.hammer import HammerIndex, HammerLoader
from polardepth_tpu.data.synthetic import SyntheticHammer, write_synthetic_scene
from polardepth_tpu.data.pipeline import BatchIterator, device_prefetch
from polardepth_tpu.data.kitti import (
    KittiRawIndex, KittiOdomIndex, KittiDepthIndex,
    CityscapesPreprocessedIndex, CityscapesEvalIndex,
)
