"""Score/label aggregation helpers.

Counterpart of /root/reference/lib/utils/utils.py:8-21 (dead code in the
reference — imported nowhere — kept for component-inventory parity).
"""

from __future__ import annotations

import numpy as np


def get_score_label_array_from_dict(score_dict, label_dict):
    """Collapse per-key score/label lists to (max-score, max-label) arrays."""
    assert len(score_dict) == len(label_dict), \
        "The score_dict and label_dict don't match"
    score = np.ones(len(score_dict))
    label = np.ones(len(label_dict))
    for idx, (key, score_list) in enumerate(score_dict.items()):
        label[idx] = max(label_dict[key])
        score[idx] = max(score_list)
    return score, label
