"""Score/label dict flattening helper.

Parity: ``/root/reference/lib/utils/utils.py:8-21`` — the reference's only
generic-utils function (dead code there: no driver imports it, SURVEY.md
§2.7). Ported to make the component inventory 100%: collapses two
key-aligned ``defaultdict(list)``s (per-key score lists and per-key label
lists, e.g. per-image crops scored separately) into flat max-pooled arrays
ready for sklearn-style metric calls.
"""

from __future__ import annotations

import numpy as np


def get_score_label_array_from_dict(score_dict, label_dict):
    """Max-pool each key's score/label list into aligned 1-D arrays.

    Keys are iterated in ``score_dict`` order and looked up in
    ``label_dict`` (same behavior as the reference, including raising
    ``KeyError`` — or fabricating an entry for a ``defaultdict`` — when a
    score key is missing from ``label_dict``).
    """
    if len(score_dict) != len(label_dict):
        raise AssertionError("The score_dict and label_dict don't match")
    score = np.ones(len(score_dict))
    label = np.ones(len(label_dict))
    for idx, (key, scores) in enumerate(score_dict.items()):
        label[idx] = max(label_dict[key])
        score[idx] = max(scores)
    return score, label
