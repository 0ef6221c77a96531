"""Evaluation harness: per-material metric tables and point-cloud export."""

from polardepth_tpu.eval.evaluation import (
    MATERIAL_THRESHOLDS, eval_step_metrics, MetricAccumulator, format_table,
)
