"""Export an orbax checkpoint to a reference-format torch .pth.tar.

Completes the migration loop (docs/MIGRATION.md): a TPU-trained
checkpoint saved by shotvae_tpu.io.checkpoint.CheckpointManager is
converted into the reference's checkpoint dict shape
``{"epoch", "args", "state_dict"}`` (/root/reference/main_shot_vae.py
:386-406 saves {epoch, args, state_dict, optimizer}; optimizer state is
optax-specific and not exported — resume in torch with a fresh optimizer).

Usage:
  python scripts/export_torch_checkpoint.py --ckpt CKPT --out model.pth.tar
      [--kind auto|vae|wideresnet|preactresnet|densenet|classifier|
       smooth_vae|mlp] [--encoder-kind auto]

``--ckpt`` accepts a pointer-managed name (…/checkpoint), its run folder,
or a raw orbax directory. ``--kind auto`` sniffs the model family from the
parameter tree plus the stored config's net_name.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _resolve(path: str) -> str:
    """Follow CheckpointManager's pointer conventions (io/checkpoint.py)."""
    from shotvae_tpu.io.checkpoint import resolve_checkpoint_path

    return resolve_checkpoint_path(path)


def _sniff_kind(params: dict, net_name: str) -> tuple:
    """-> (kind, encoder_kind). WRN and PreActResNet basic blocks share
    our naming, so the trunk family inside a VAE comes from net_name;
    with no usable net_name the sniff is ambiguous and refuses rather
    than silently exporting WRN-named keys for a preact tree."""
    def trunk_kind(tree, name):
        if any(k.startswith("denseblock") for k in tree):
            return "densenet"
        if "preactresnet" in name:
            return "preactresnet"
        if "wideresnet" in name:
            return "wideresnet"
        raise SystemExit(
            "cannot sniff the trunk family: WRN and PreActResNet trees "
            f"share our naming and the stored net_name ({name!r}) names "
            "neither — pass --kind (or --encoder-kind for a VAE) "
            "explicitly")

    if "feature_extractor" in params:
        return "vae", trunk_kind(params["feature_extractor"], net_name)
    if "fc" in params and "encoder" in params:
        return "classifier", "wideresnet"
    if "fc0" in params and "conv0" in params:
        return "mlp", None
    if "enc_conv0" in params:
        return "smooth_vae", None
    return trunk_kind(params, net_name), None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="orbax checkpoint -> reference torch .pth.tar")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--kind", default="auto")
    ap.add_argument("--encoder-kind", default="auto",
                    help="vae trunk family when --kind vae")
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp

    from shotvae_tpu.io import torch_export

    path = _resolve(args.ckpt)
    if not os.path.exists(path):
        raise FileNotFoundError(f"Checkpoint Resume File {path} Not Found")
    restored = ocp.StandardCheckpointer().restore(path)
    meta = {"epoch": 0, "config": {}}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)

    params = restored.get("params") or {}
    stats = restored.get("batch_stats") or {}
    if not params:
        raise SystemExit(
            f"no 'params' tree in {path} — not a shotvae_tpu checkpoint "
            "payload (raw orbax dirs must hold the manager's "
            "{params, batch_stats, opt_state, step} dict)")
    net_name = str(meta.get("config", {}).get("net_name", ""))
    kind = enc = None
    if args.kind == "auto" or (args.kind == "vae"
                               and args.encoder_kind == "auto"):
        kind, enc = _sniff_kind(params, net_name)
    if args.kind != "auto":
        kind = args.kind
    if args.encoder_kind != "auto":
        enc = args.encoder_kind

    if kind == "smooth_vae":
        # mnist and svhn variants differ in widths (models/smooth_vae.py:
        # mnist 64-ch encoder tail / 64 reshape, svhn 128/128); only the
        # reshape-seam dims matter to the export, and both are recoverable
        # from the Dense kernels flanking the 4x4 reshapes.
        enc_tail = int(np.shape(params["features_to_hidden"]["kernel"])[0]
                       ) // 16
        reshape_ch = int(np.shape(params["hidden_to_features"]["kernel"])[1]
                         ) // 16
        sd = torch_export.export_smooth_vae_state_dict(
            params, encoder_channels=(enc_tail,), reshape_channels=reshape_ch)
    elif kind == "mlp":
        sd = torch_export.export_mlp_state_dict(params)
    elif kind == "vae":
        sd = torch_export.export_torch_state_dict(
            params, stats, "vae", encoder_kind=enc or "wideresnet")
    else:
        sd = torch_export.export_torch_state_dict(params, stats, kind)

    import torch

    payload = {
        "epoch": int(meta.get("epoch", 0)),
        "args": meta.get("config", {}),
        # copy: exported leaves can be non-writable views, which torch
        # tensors reject
        "state_dict": {k: torch.as_tensor(np.array(v))
                       for k, v in sd.items()},
    }
    torch.save(payload, args.out)
    print(json.dumps({"kind": kind, "encoder_kind": enc,
                      "keys": len(sd), "epoch": payload["epoch"],
                      "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
