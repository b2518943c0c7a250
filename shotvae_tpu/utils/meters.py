"""Running meters for host-side metric aggregation.

``AverageMeter`` mirrors /root/reference/lib/utils/avgmeter.py:1-17
(val/avg/sum/count). ``MetricAccumulator`` batches that pattern over a whole
metrics dict of device scalars, converting to host floats once per call (one
device sync, not one per metric).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0.0

    def update(self, val, n: float = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1e-12)


class MetricAccumulator:
    """Sums metric dicts (device scalars) and exposes means.

    Intended for the eval steps which return per-batch *sums* plus a
    ``count`` key; ``averages()`` divides every ``*_sum`` by the total count
    and passes counts through as rates.
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}

    def update(self, metrics: Dict):
        host = {k: float(np.asarray(v)) for k, v in metrics.items()}
        for k, v in host.items():
            self.totals[k] = self.totals.get(k, 0.0) + v

    def averages(self) -> Dict[str, float]:
        count = self.totals.get("count", 0.0) or 1.0
        out = {}
        for k, v in self.totals.items():
            if k == "count":
                out[k] = v
            elif k.endswith("_sum"):
                out[k[:-4] + "_avg"] = v / count
            elif k.endswith("_count"):
                out[k[:-6] + "_rate"] = v / count
            else:
                out[k] = v / count
        return out
