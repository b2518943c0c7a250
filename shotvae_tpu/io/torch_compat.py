"""Import reference (PyTorch) checkpoints into shotvae_tpu parameter trees.

Lets a user of FengHZ/SHOT-VAE bring trained weights across: converts a
``state_dict`` from the reference model classes (shot_vae_model/vae.py,
wideresnet.py, classifier_model/wideresnet.py — with or without
nn.DataParallel's ``module.`` wrappers) into this framework's
(params, batch_stats) trees.

Leaf conventions:
  Conv2d      weight (O,I,kh,kw)  -> kernel (kh,kw,I,O)
  Linear      weight (O,I)        -> kernel (I,O)
  ConvT2d     weight (I,O,kh,kw)  -> kernel (kh,kw,I,O) spatially flipped
              (flax ConvTranspose default transpose_kernel=False; verified
              numerically against torch.nn.functional.conv_transpose2d)
  BatchNorm   weight/bias         -> scale/bias (params)
              running_mean/var    -> mean/var   (batch_stats)

Currently mapped: WideResNet trunk, the full SHOT/M2 VAE on a WRN encoder,
and the classifier. PreActResNet / DenseNet imports are not yet wired
(their from-scratch training is the supported path).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _translate_trunk(key: str) -> str:
    """Reference WRN trunk dotted name -> our param path (no leaf)."""
    key = re.sub(r"^encoder\.", "", key)
    if key.startswith("pre_process.conv0"):
        return "pre_process/conv0"
    m = re.match(r"wideblock(\d+)\.wide_block\.wideunit(\d+)\.(.*)", key)
    if m:
        k, i, rest = m.group(1), m.group(2), m.group(3)
        base = f"block{k}_unit{i}"
        if rest.startswith("f_block.norm1"):
            return f"{base}/norm1/bn"
        if rest.startswith("f_block.conv1"):
            return f"{base}/conv1"
        if rest.startswith("f_block.norm2"):
            return f"{base}/norm2/bn"
        if rest.startswith("f_block.conv2"):
            return f"{base}/conv2"
        if rest.startswith("i_block.norm"):
            return f"{base}/shortcut_norm/bn"
        if rest.startswith("i_block.conv"):
            return f"{base}/shortcut_conv"
    if key.startswith("transition.norm"):
        return "transition_norm/bn"
    raise KeyError(f"unmapped trunk key: {key}")


def _translate_vae(key: str) -> str:
    if key.startswith("feature_extractor."):
        return ("feature_extractor/"
                + _translate_trunk(key[len("feature_extractor."):]))
    if key.startswith("continuous_inference.mean.fc"):
        return "cont_mean"
    if key.startswith("continuous_inference.log_sigma.fc"):
        return "cont_log_sigma"
    if key.startswith("disc_latent_inference.fc"):
        return "disc_inference"
    m = re.match(r"feature_reconstructor\.decoder\.(\d+)\.", key)
    if m:
        idx = int(m.group(1))
        if idx % 3 == 0:   # ConvTranspose at 0,3,6,9,12,15
            return f"feature_reconstructor/up{idx // 3}"
        if idx % 3 == 1:   # BatchNorm at 1,4,7,10,13
            return f"feature_reconstructor/norm{(idx - 1) // 3}/bn"
    raise KeyError(f"unmapped vae key: {key}")


def _translate_classifier(key: str) -> str:
    if key.startswith("encoder."):
        return "encoder/" + _translate_trunk(key[len("encoder."):])
    if key.startswith("global_avg.norm"):
        # the classifier's head BN plays our trunk's transition_norm role
        return "encoder/transition_norm/bn"
    if key.startswith("classification.fc"):
        return "fc"
    raise KeyError(f"unmapped classifier key: {key}")


_TRANSLATORS = {
    "wideresnet": _translate_trunk,
    "vae": _translate_vae,
    "classifier": _translate_classifier,
}


def _convert_leaf(path: str, leaf_name: str, value: np.ndarray):
    """-> (tree, our_leaf_name, converted) where tree is 'params'/'batch_stats'."""
    v = np.asarray(value)
    if leaf_name == "num_batches_tracked":
        return None
    if leaf_name in ("running_mean", "running_var"):
        return ("batch_stats", {"running_mean": "mean",
                                "running_var": "var"}[leaf_name], v)
    if leaf_name == "bias":
        return ("params", "bias", v)
    assert leaf_name == "weight", leaf_name
    if path.endswith("/bn"):
        return ("params", "scale", v)
    if v.ndim == 4:
        if path.split("/")[-1].startswith("up"):
            # ConvTranspose: (I,O,kh,kw) -> flipped (kh,kw,I,O)
            return ("params", "kernel",
                    np.ascontiguousarray(v.transpose(2, 3, 0, 1)[::-1, ::-1]))
        # Conv: (O,I,kh,kw) -> (kh,kw,I,O)
        return ("params", "kernel", np.ascontiguousarray(v.transpose(2, 3, 1, 0)))
    if v.ndim == 2:
        return ("params", "kernel", np.ascontiguousarray(v.T))
    raise ValueError(f"unexpected weight shape {v.shape} at {path}")


def import_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                            kind: str) -> Tuple[dict, dict]:
    """Convert a reference state_dict to nested (params, batch_stats) dicts.

    ``kind``: 'wideresnet' | 'vae' | 'classifier'. DataParallel ``module.``
    wrappers are stripped. Values may be torch tensors or numpy arrays.
    """
    translate = _TRANSLATORS[kind]
    params: dict = {}
    batch_stats: dict = {}
    for full_key, value in state_dict.items():
        value = np.asarray(getattr(value, "detach", lambda: value)().cpu()
                           if hasattr(value, "detach") else value,
                           dtype=np.float32)
        clean = full_key.replace(".module", "")
        stem, leaf_name = clean.rsplit(".", 1)
        path = translate(stem + ".")
        converted = _convert_leaf(path, leaf_name, value)
        if converted is None:
            continue
        tree_name, our_leaf, v = converted
        tree = params if tree_name == "params" else batch_stats
        node = tree
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node[our_leaf] = v
    return params, batch_stats


def merge_imported(template_params, template_stats, params, batch_stats):
    """Overlay imported leaves onto template trees (shape-checked)."""

    def walk(tmpl, imp, prefix):
        out = {}
        for k, v in tmpl.items():
            if isinstance(v, dict) or hasattr(v, "items"):
                out[k] = walk(dict(v), imp.get(k, {}), prefix + (k,))
            else:
                if k in imp:
                    got = np.asarray(imp[k])
                    assert got.shape == tuple(v.shape), (
                        f"shape mismatch at {'/'.join(prefix + (k,))}: "
                        f"{got.shape} vs {tuple(v.shape)}")
                    out[k] = got.astype(np.asarray(v).dtype)
                else:
                    out[k] = v
        return out

    new_params = walk(dict(template_params), params, ())
    new_stats = walk(dict(template_stats), batch_stats, ())
    return new_params, new_stats
