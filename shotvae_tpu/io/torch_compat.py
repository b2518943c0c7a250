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

Currently mapped: every encoder family (WideResNet, PreActResNet,
DenseNet) plus the full SHOT/M2 VAE and the classifier — golden-tested
against the actual reference models in tests/test_torch_compat*.py.
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


def _translate_any_trunk(key: str) -> str:
    """Dispatch a trunk key to its encoder family by naming signature:
    denseblock/transition{N} -> densenet, .preact_block. -> preactresnet,
    otherwise the WRN trunk (which also owns the shared pre_process and
    bare transition.norm names)."""
    bare = re.sub(r"^encoder\.", "", key)
    if re.match(r"(denseblock|transition\d)", bare):
        return _translate_densenet(bare)
    if ".preact_block." in bare:
        return _translate_preact(bare)
    return _translate_trunk(key)


def _translate_vae(key: str) -> str:
    if key.startswith("feature_extractor."):
        return ("feature_extractor/"
                + _translate_any_trunk(key[len("feature_extractor."):]))
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


def _translate_preact(key: str) -> str:
    key = re.sub(r"^encoder\.", "", key)
    if key.startswith("pre_process.conv0"):
        return "pre_process/conv0"
    m = re.match(r"block(\d+)\.preact_block\.unit(\d+)\.(.*)", key)
    if m:
        k, i, rest = m.group(1), m.group(2), m.group(3)
        base = f"block{k}_unit{i}"
        for norm in ("norm1", "norm2", "norm3"):
            if rest.startswith(f"f_block.{norm}"):
                return f"{base}/{norm}/bn"
        for conv in ("conv1", "conv2", "conv3"):
            if rest.startswith(f"f_block.{conv}"):
                return f"{base}/{conv}"
        if rest.startswith("i_block.norm"):
            return f"{base}/shortcut_norm/bn"
        if rest.startswith("i_block.conv"):
            return f"{base}/shortcut_conv"
    if key.startswith("transition.norm"):
        return "transition_norm/bn"
    raise KeyError(f"unmapped preactresnet key: {key}")


def _translate_densenet(key: str, num_blocks: int = 0) -> str:
    key = re.sub(r"^encoder\.", "", key)
    if key.startswith("pre_process.conv0"):
        return "pre_process/conv0"
    m = re.match(r"denseblock(\d+)\.denselayer(\d+)\.(norm1|conv1|norm2|conv2)",
                 key)
    if m:
        k, i, part = m.group(1), m.group(2), m.group(3)
        suffix = "/bn" if part.startswith("norm") else ""
        return f"denseblock{k}/denselayer{i}/{part}{suffix}"
    m = re.match(r"transition(\d+)\.(norm|conv)", key)
    if m:
        k, part = m.group(1), m.group(2)
        # the LAST reference transition holds only the final norm
        if part == "norm" and f"transition{k}.conv" not in _DENSENET_KEYS:
            return "final_norm/bn"
        return f"transition{k}_{part}" + ("/bn" if part == "norm" else "")
    raise KeyError(f"unmapped densenet key: {key}")


_DENSENET_KEYS: set = set()  # populated per import for last-transition detection

_TRANSLATORS = {
    "wideresnet": _translate_trunk,
    "vae": _translate_vae,
    "classifier": _translate_classifier,
    "preactresnet": _translate_preact,
    "densenet": _translate_densenet,
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
    if kind == "densenet" or any("denseblock" in k for k in state_dict):
        # stems (e.g. 'transition1.conv') for last-transition detection,
        # normalized past the vae's feature_extractor.encoder. prefix so a
        # densenet trunk inside the VAE resolves identically
        _DENSENET_KEYS.clear()
        _DENSENET_KEYS.update(
            re.sub(r"^(feature_extractor\.)?(encoder\.)?", "",
                   k.replace(".module", "")).rsplit(".", 1)[0]
            for k in state_dict)
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


def _chw_to_hwc_perm(c: int, h: int, w: int) -> np.ndarray:
    """perm[i_hwc] = i_chw for flattening-order conversion at reshape seams."""
    idx = np.arange(c * h * w).reshape(c, h, w)       # torch (C,H,W) order
    return idx.transpose(1, 2, 0).reshape(-1)          # -> (H,W,C) order


def import_smooth_vae_state_dict(state_dict, *, encoder_channels=(32, 64, 64),
                                 reshape_channels: int = 64,
                                 spatial: int = 4) -> Tuple[dict, dict]:
    """Convert a smooth-VAE (mnist_VAE / svhn_VAE) state_dict.

    The two Dense layers flanking the torch (C,H,W) reshapes need their
    input/output dimensions permuted to our (H,W,C) flattening order.
    """
    perm_enc = _chw_to_hwc_perm(encoder_channels[-1], spatial, spatial)
    perm_dec = _chw_to_hwc_perm(reshape_channels, spatial, spatial)
    params: dict = {}

    def put(path, leaf, v):
        node = params
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node[leaf] = np.ascontiguousarray(v)

    for full_key, value in state_dict.items():
        v = np.asarray(getattr(value, "detach", lambda: value)().cpu()
                       if hasattr(value, "detach") else value, np.float32)
        key = full_key.replace(".module", "")
        stem, leaf = key.rsplit(".", 1)
        m = re.match(r"img_to_features\.(\d+)$", stem)
        if m:
            put(f"enc_conv{int(m.group(1)) // 2}",
                "kernel" if leaf == "weight" else "bias",
                v.transpose(2, 3, 1, 0) if leaf == "weight" else v)
            continue
        if stem == "features_to_hidden.0":
            if leaf == "weight":
                put("features_to_hidden", "kernel", v.T[perm_enc, :])
            else:
                put("features_to_hidden", "bias", v)
            continue
        if stem in ("fc_mean", "fc_log_var"):
            put(stem, "kernel" if leaf == "weight" else "bias",
                v.T if leaf == "weight" else v)
            continue
        m = re.match(r"fc_alphas\.(\d+)$", stem)
        if m:
            put(f"fc_alpha{m.group(1)}",
                "kernel" if leaf == "weight" else "bias",
                v.T if leaf == "weight" else v)
            continue
        if stem == "latent_to_features.0":
            put("latent_to_hidden", "kernel" if leaf == "weight" else "bias",
                v.T if leaf == "weight" else v)
            continue
        if stem == "latent_to_features.2":
            if leaf == "weight":
                put("hidden_to_features", "kernel", v.T[:, perm_dec])
            else:
                put("hidden_to_features", "bias", v[perm_dec])
            continue
        m = re.match(r"features_to_img\.(\d+)$", stem)
        if m:
            name = f"dec_convt{int(m.group(1)) // 2}"
            if leaf == "weight":
                put(name, "kernel",
                    v.transpose(2, 3, 0, 1)[::-1, ::-1])
            else:
                put(name, "bias", v)
            continue
        raise KeyError(f"unmapped smooth-vae key: {key}")
    return params, {}


def import_mlp_state_dict(state_dict) -> Tuple[dict, dict]:
    """Convert a classifier MLP state_dict (classifier_model/mlp.py:7-44).

    Keys: ``encoder.module.{0,2,4}`` (convs) and ``classifier.module.{0,2}``
    (the two Dense layers). The first Dense consumes the flattened 64x4x4
    feature map, so its input dimension is permuted from torch (C,H,W) to
    our (H,W,C) flattening order.
    """
    perm = _chw_to_hwc_perm(64, 4, 4)
    params: dict = {}
    for full_key, value in state_dict.items():
        v = np.asarray(getattr(value, "detach", lambda: value)().cpu()
                       if hasattr(value, "detach") else value, np.float32)
        key = full_key.replace(".module", "")
        stem, leaf = key.rsplit(".", 1)
        m = re.match(r"encoder\.(\d+)$", stem)
        if m:
            name, v = f"conv{int(m.group(1)) // 2}", (
                v.transpose(2, 3, 1, 0) if leaf == "weight" else v)
        elif stem == "classifier.0":
            name, v = "fc0", (v.T[perm, :] if leaf == "weight" else v)
        elif stem == "classifier.2":
            name, v = "fc1", (v.T if leaf == "weight" else v)
        else:
            raise KeyError(f"unmapped mlp key: {key}")
        params.setdefault(name, {})[
            "kernel" if leaf == "weight" else "bias"] = np.ascontiguousarray(v)
    return params, {}


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
