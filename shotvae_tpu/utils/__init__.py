"""Generic utilities: meters, pairwise distance metrics, dict flattening."""

from shotvae_tpu.utils.meters import AverageMeter, MetricAccumulator
from shotvae_tpu.utils import dist_metrics
from shotvae_tpu.utils.score_label import get_score_label_array_from_dict

__all__ = ["AverageMeter", "MetricAccumulator", "dist_metrics",
           "get_score_label_array_from_dict"]
