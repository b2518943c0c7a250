"""Generic utilities: meters, pairwise distance metrics."""

from shotvae_tpu.utils.meters import AverageMeter, MetricAccumulator
from shotvae_tpu.utils import dist_metrics

__all__ = ["AverageMeter", "MetricAccumulator", "dist_metrics"]
