"""Export shotvae_tpu parameter trees to reference (PyTorch) state_dicts.

The inverse of io/torch_compat.py's importers: converts this framework's
(params, batch_stats) trees back into a ``state_dict`` loadable with
``strict=True`` by the reference model classes
(/root/reference/shot_vae_model/{vae,wideresnet,preactresnet,densenet}.py,
classifier_model/{wideresnet,mlp}.py, smooth_vae_model/*_vae.py), so
TPU-trained weights can move back into the torch ecosystem. No torch
dependency here — values are numpy arrays; wrap with ``torch.as_tensor``
at load time. Golden-tested by loading exports into the actual reference
classes and comparing forwards (tests/test_torch_export.py).

Reference models built with ``data_parallel=True`` name their leaves with
``.module`` wrappers at model-specific places (e.g. shot_vae_model/vae.py
:96-132 wraps each submodule); use :func:`insert_module_wrappers` with the
target model's own key list to produce the wrapped names exactly.

Known limitation: BatchNorm ``num_batches_tracked`` is exported as 0 (this
framework does not count BN update steps). Irrelevant for inference and for
continued training at torch's default ``momentum=0.1``; ONLY if a torch
user continues training with ``momentum=None`` (cumulative averaging) would
running stats be re-weighted as if freshly initialized. The reference
models all use the default momentum, so this cannot bite reference code.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable

import numpy as np

from shotvae_tpu.io.torch_compat import _chw_to_hwc_perm

# ---------------------------------------------------------------------------
# path inverters: our node path (no leaf) -> reference dotted stem
# ---------------------------------------------------------------------------

_WRN_REST_INV = {
    "norm1/bn": "f_block.norm1", "conv1": "f_block.conv1",
    "norm2/bn": "f_block.norm2", "conv2": "f_block.conv2",
    "shortcut_norm/bn": "i_block.norm", "shortcut_conv": "i_block.conv",
}


def _invert_wrn_trunk(path: str) -> str:
    """Inverse of torch_compat._translate_trunk (shot_vae_model/wideresnet.py
    naming: encoder.wideblock{k}.wide_block.wideunit{i}.{f,i}_block.*)."""
    if path == "pre_process/conv0":
        return "pre_process.conv0"
    m = re.match(r"block(\d+)_unit(\d+)/(.+)$", path)
    if m:
        return (f"wideblock{m.group(1)}.wide_block.wideunit{m.group(2)}"
                f".{_WRN_REST_INV[m.group(3)]}")
    if path == "transition_norm/bn":
        return "transition.norm"
    raise KeyError(f"uninvertible wideresnet path: {path}")


def _invert_preact_trunk(path: str) -> str:
    """Inverse of _translate_preact (shot_vae_model/preactresnet.py:85-133
    naming: block{k}.preact_block.unit{i}.*)."""
    if path == "pre_process/conv0":
        return "pre_process.conv0"
    m = re.match(r"block(\d+)_unit(\d+)/(.+)$", path)
    if m:
        rest = m.group(3)
        if rest == "shortcut_norm/bn":
            tail = "i_block.norm"
        elif rest == "shortcut_conv":
            tail = "i_block.conv"
        else:  # norm{1..3}/bn or conv{1..3}
            tail = "f_block." + rest.split("/")[0]
        return f"block{m.group(1)}.preact_block.unit{m.group(2)}.{tail}"
    if path == "transition_norm/bn":
        return "transition.norm"
    raise KeyError(f"uninvertible preactresnet path: {path}")


def _make_invert_densenet_trunk(paths: Iterable[str]):
    """Inverse of _translate_densenet. The reference's LAST transition holds
    only the final norm (densenet.py:124-132), which we store as final_norm;
    its index is one past the highest conv-bearing transition we hold."""
    trans = [int(m.group(1)) for p in paths
             for m in [re.match(r"(?:.*/)?transition(\d+)_", p)] if m]
    last = (max(trans) + 1) if trans else 1

    def invert(path: str) -> str:
        if path == "pre_process/conv0":
            return "pre_process.conv0"
        m = re.match(r"denseblock(\d+)/denselayer(\d+)/(norm1|conv1|norm2|conv2)",
                     path)
        if m:
            return (f"denseblock{m.group(1)}.denselayer{m.group(2)}"
                    f".{m.group(3)}")
        m = re.match(r"transition(\d+)_(norm|conv)", path)
        if m:
            return f"transition{m.group(1)}.{m.group(2)}"
        if path == "final_norm/bn":
            return f"transition{last}.norm"
        raise KeyError(f"uninvertible densenet path: {path}")

    return invert


def _make_invert_vae(paths, encoder_kind: str):
    """Inverse of _translate_vae (shot_vae_model/vae.py:89-151 composition).

    ``encoder_kind`` selects the trunk inverter ('wideresnet' |
    'preactresnet' | 'densenet') — our trees name WRN and PreActResNet
    units identically, so the trunk family cannot be sniffed from paths.
    """
    pre = "feature_extractor/"
    if encoder_kind == "densenet":
        trunk_inv = _make_invert_densenet_trunk(
            p[len(pre):] for p in paths if p.startswith(pre))
    else:
        trunk_inv = {"wideresnet": _invert_wrn_trunk,
                     "preactresnet": _invert_preact_trunk}[encoder_kind]

    def invert(path: str) -> str:
        if path.startswith(pre):
            # the reference trunk nests its blocks under an 'encoder'
            # Sequential (wideresnet.py:76,81,89)
            return "feature_extractor.encoder." + trunk_inv(path[len(pre):])
        if path == "cont_mean":
            return "continuous_inference.mean.fc"
        if path == "cont_log_sigma":
            return "continuous_inference.log_sigma.fc"
        if path == "disc_inference":
            return "disc_latent_inference.fc"
        m = re.match(r"feature_reconstructor/up(\d+)$", path)
        if m:  # decoder Sequential: ConvT at 0,3,6,9,12,15 (decoder.py:12-62)
            return f"feature_reconstructor.decoder.{int(m.group(1)) * 3}"
        m = re.match(r"feature_reconstructor/norm(\d+)/bn$", path)
        if m:  # BatchNorm at 1,4,7,10,13
            return f"feature_reconstructor.decoder.{int(m.group(1)) * 3 + 1}"
        raise KeyError(f"uninvertible vae path: {path}")

    return invert


def _invert_classifier(path: str) -> str:
    """Inverse of _translate_classifier (classifier_model/wideresnet.py):
    the trunk's transition BN lives in the reference's global_avg head
    (:92), and the FC head in 'classification' (:97-102)."""
    if path == "encoder/transition_norm/bn":
        return "global_avg.norm"
    if path.startswith("encoder/"):
        return "encoder." + _invert_wrn_trunk(path[len("encoder/"):])
    if path == "fc":
        return "classification.fc"
    raise KeyError(f"uninvertible classifier path: {path}")


# ---------------------------------------------------------------------------
# tree flattening + leaf conversion
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=()) -> Dict[str, Dict[str, np.ndarray]]:
    """Nested dict -> {node_path: {leaf_name: np.float32 array}}."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in dict(tree).items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out.setdefault("/".join(prefix), {})[k] = np.asarray(
                v, dtype=np.float32)
    return out


def _emit_node(out: dict, stem: str, path: str, leaves: dict,
               stats: dict) -> None:
    """Write the torch leaves for one of our param nodes into ``out``."""
    if path.endswith("/bn"):
        out[stem + ".weight"] = leaves["scale"]
        out[stem + ".bias"] = leaves["bias"]
        st = stats.get(path, {})
        out[stem + ".running_mean"] = st["mean"]
        out[stem + ".running_var"] = st["var"]
        # torch BatchNorm state_dicts carry this counter; 0 is what a
        # freshly-constructed reference module holds
        out[stem + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)
        return
    kernel = leaves.get("kernel")
    if kernel is not None:
        if kernel.ndim == 4:
            if path.split("/")[-1].startswith("up"):
                # ConvTranspose: (kh,kw,I,O) spatially flipped -> (I,O,kh,kw)
                out[stem + ".weight"] = np.ascontiguousarray(
                    kernel[::-1, ::-1].transpose(2, 3, 0, 1))
            else:
                # Conv: (kh,kw,I,O) -> (O,I,kh,kw)
                out[stem + ".weight"] = np.ascontiguousarray(
                    kernel.transpose(3, 2, 0, 1))
        elif kernel.ndim == 2:  # Linear: (I,O) -> (O,I)
            out[stem + ".weight"] = np.ascontiguousarray(kernel.T)
        else:
            raise ValueError(f"unexpected kernel ndim at {path}: "
                             f"{kernel.shape}")
    if "bias" in leaves:
        out[stem + ".bias"] = leaves["bias"]


def export_torch_state_dict(params, batch_stats, kind: str, *,
                            encoder_kind: str = "wideresnet"
                            ) -> Dict[str, np.ndarray]:
    """Convert our (params, batch_stats) trees to a reference state_dict.

    ``kind``: 'wideresnet' | 'preactresnet' | 'densenet' | 'vae' |
    'classifier'. For ``kind='vae'``, ``encoder_kind`` names the trunk
    family. Output keys use the plain (``data_parallel=False``) naming;
    see :func:`insert_module_wrappers` for DataParallel targets.
    """
    flat_p = _flatten(params)
    flat_s = _flatten(batch_stats)
    prefix = ""
    if kind == "vae":
        invert = _make_invert_vae(flat_p, encoder_kind)
    elif kind == "classifier":
        invert = _invert_classifier
    else:
        # standalone trunks nest all modules under an 'encoder' Sequential
        # (wideresnet.py:76,81-94, preactresnet.py, densenet.py:103-132)
        prefix = "encoder."
        if kind == "densenet":
            invert = _make_invert_densenet_trunk(flat_p)
        else:
            invert = {"wideresnet": _invert_wrn_trunk,
                      "preactresnet": _invert_preact_trunk}[kind]
    out: Dict[str, np.ndarray] = {}
    for path, leaves in flat_p.items():
        _emit_node(out, prefix + invert(path), path, leaves, flat_s)
    return out


# ---------------------------------------------------------------------------
# smooth-ELBO VAE + classifier MLP (reshape-seam permutations inverted)
# ---------------------------------------------------------------------------


def export_smooth_vae_state_dict(params, *, encoder_channels=(32, 64, 64),
                                 reshape_channels: int = 64,
                                 spatial: int = 4) -> Dict[str, np.ndarray]:
    """Inverse of import_smooth_vae_state_dict (smooth_vae_model/mnist_vae.py
    / svhn_vae.py). The Dense layers flanking the torch (C,H,W) reshapes get
    their flattening-order permutations inverted."""
    inv_enc = np.argsort(_chw_to_hwc_perm(encoder_channels[-1], spatial,
                                          spatial))
    inv_dec = np.argsort(_chw_to_hwc_perm(reshape_channels, spatial, spatial))
    out: Dict[str, np.ndarray] = {}
    for name, leaves in _flatten(params).items():
        k, b = leaves.get("kernel"), leaves.get("bias")
        m = re.match(r"enc_conv(\d+)$", name)
        if m:  # convs at even indices of the img_to_features Sequential
            stem = f"img_to_features.{int(m.group(1)) * 2}"
            out[stem + ".weight"] = np.ascontiguousarray(
                k.transpose(3, 2, 0, 1))
            out[stem + ".bias"] = b
            continue
        m = re.match(r"dec_convt(\d+)$", name)
        if m:
            stem = f"features_to_img.{int(m.group(1)) * 2}"
            out[stem + ".weight"] = np.ascontiguousarray(
                k[::-1, ::-1].transpose(2, 3, 0, 1))
            out[stem + ".bias"] = b
            continue
        m = re.match(r"fc_alpha(\d+)$", name)
        if m:
            stem = f"fc_alphas.{m.group(1)}"
            out[stem + ".weight"] = np.ascontiguousarray(k.T)
            out[stem + ".bias"] = b
            continue
        if name == "features_to_hidden":
            out["features_to_hidden.0.weight"] = np.ascontiguousarray(
                k[inv_enc, :].T)
            out["features_to_hidden.0.bias"] = b
        elif name in ("fc_mean", "fc_log_var"):
            out[name + ".weight"] = np.ascontiguousarray(k.T)
            out[name + ".bias"] = b
        elif name == "latent_to_hidden":
            out["latent_to_features.0.weight"] = np.ascontiguousarray(k.T)
            out["latent_to_features.0.bias"] = b
        elif name == "hidden_to_features":
            out["latent_to_features.2.weight"] = np.ascontiguousarray(
                k[:, inv_dec].T)
            out["latent_to_features.2.bias"] = np.ascontiguousarray(
                b[inv_dec])
        else:
            raise KeyError(f"uninvertible smooth-vae path: {name}")
    return out


def export_mlp_state_dict(params) -> Dict[str, np.ndarray]:
    """Inverse of import_mlp_state_dict (classifier_model/mlp.py:7-44)."""
    inv = np.argsort(_chw_to_hwc_perm(64, 4, 4))
    out: Dict[str, np.ndarray] = {}
    for name, leaves in _flatten(params).items():
        k, b = leaves.get("kernel"), leaves.get("bias")
        m = re.match(r"conv(\d+)$", name)
        if m:
            stem = f"encoder.{int(m.group(1)) * 2}"
            out[stem + ".weight"] = np.ascontiguousarray(
                k.transpose(3, 2, 0, 1))
            out[stem + ".bias"] = b
        elif name == "fc0":
            out["classifier.0.weight"] = np.ascontiguousarray(k[inv, :].T)
            out["classifier.0.bias"] = b
        elif name == "fc1":
            out["classifier.2.weight"] = np.ascontiguousarray(k.T)
            out["classifier.2.bias"] = b
        else:
            raise KeyError(f"uninvertible mlp path: {name}")
    return out


def insert_module_wrappers(state_dict: Dict[str, np.ndarray],
                           target_keys: Iterable[str]
                           ) -> Dict[str, np.ndarray]:
    """Rename plain exported keys to a DataParallel model's ``.module``-
    wrapped key set. ``target_keys`` is the target model's own
    ``state_dict().keys()``; every exported key must be used exactly once."""
    out: Dict[str, np.ndarray] = {}
    used = set()
    for tk in target_keys:
        stripped = tk.replace(".module", "")
        if stripped not in state_dict:
            raise KeyError(f"no exported value for target key {tk!r}")
        out[tk] = state_dict[stripped]
        used.add(stripped)
    leftover = set(state_dict) - used
    if leftover:
        raise KeyError(f"exported keys unused by target: {sorted(leftover)}")
    return out
