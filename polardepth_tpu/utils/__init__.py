"""Observability and small utilities: colormaps, metric writers, timing."""

from polardepth_tpu.utils.colormap import colormap_plasma, normalize_image
from polardepth_tpu.utils.logging import MetricWriter, sec_to_hm_str
