"""Checkpoint conversion CLI: reference ``.pth`` -> this framework's ``.npz``.

A user migrating from the reference repo owns two kinds of torch
checkpoints (SURVEY.md §2 #4/#9):

  - torchvision-zoo ResNet weights, which the reference loads with its
    size-tolerant homemade loader (model/resnet_cubic.py:183-201,228-237);
  - the released trained ConvLSTM ``.pth`` the temporal driver restores
    (temporal_model/test_temporal.py:147-150).

This CLI is the one-shot bridge (torch is used host-side only, to read the
file; conversion itself is numpy):

    cp360-convert --kind resnet --arch resnet50 zoo_resnet50.pth resnet50.npz
    cp360-convert --kind clstm  released_clstm.pth clstm.npz

The .npz round-trips through ``compat.torch_weights.load_npz`` into the
nested param dicts every model constructor here accepts; layout mapping
(OIHW->HWIO etc.) is documented in compat/torch_weights.py.  ``--kind
auto`` sniffs the state dict's key names.

The reverse direction also works — train or fine-tune here, then hand the
weights back to the reference repo (torch.load at
temporal_model/test_temporal.py:147-150 / the backbone loader at
model/resnet_cubic.py:183-201).  Direction is inferred from the file
extensions:

    cp360-convert trained_clstm.npz clstm_for_reference.pth
"""

from __future__ import annotations

import argparse
import sys


def sniff_kind(keys) -> str:
    """Guess 'resnet' or 'clstm' from torch state-dict key names.

    The reference CLSTM's six tensors are Conv1/Conv2/Gates .weight/.bias
    (model/clstm.py:28-34); torchvision ResNets live under layerN.* / fc.*
    and always carry BN running stats.
    """
    ks = list(keys)
    if any(k.startswith(("Conv1.", "Conv2.", "Gates.")) for k in ks):
        return "clstm"
    if any(k.startswith("features.") and ".conv." in k for k in ks):
        return "mobilenet_v2"  # torchvision inverted-residual layout
    if any(k.startswith("features.") for k in ks) and any(
            k.startswith("classifier.") for k in ks):
        return "vgg16"  # torchvision sequential-features layout
    if any(k.startswith(("layer", "fc.")) or "running_mean" in k for k in ks):
        return "resnet"
    # the reference's sequential fallback loader treats any 6-tensor dict
    # as a CLSTM (model/clstm.py:92-101); mirror that
    return "clstm" if len(ks) == 6 else "resnet"


def sniff_kind_npz(flat_keys) -> str:
    """Guess the family from our flat .npz key paths (nested-dict slashes)."""
    ks = list(flat_keys)
    if any(k.startswith("gates/") for k in ks):
        return "clstm"
    if any(k.startswith("blocks/") for k in ks):
        return "mobilenet_v2"
    if any(k.startswith("camconv/") for k in ks):
        return "vgg16"
    return "resnet"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="cp360-convert",
        description="Convert checkpoints between the reference's torch .pth "
                    "and this framework's .npz (direction follows the file "
                    "extensions)",
    )
    p.add_argument("input", help="source: .pth (torch state dict/module) or "
                                 "our .npz")
    p.add_argument("output", help="destination: .npz (import) or .pth (export)")
    p.add_argument(
        "--kind",
        choices=["auto", "resnet", "clstm", "vgg16", "mobilenet_v2"],
        default="auto",
        help="checkpoint family (default: sniff from key names)",
    )
    p.add_argument(
        "--arch", default="resnet50",
        help="resnet depth for --kind resnet (resnet18/34/50/101/152)",
    )
    args = p.parse_args(argv)

    # Conversion is host-side work; never let an incidental jax import (the
    # vgg16 head init below) wake the accelerator plugin — on this host that
    # can hang for hours during tunnel outages.  CP360_PLATFORM still wins
    # if explicitly set.
    import os

    os.environ.setdefault("CP360_PLATFORM", "cpu")
    from cp360_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from cp360_tpu.compat import torch_weights as tw

    exporting = args.input.endswith(".npz")
    if exporting and args.output.endswith(".npz"):
        print("cp360-convert: both files are .npz — nothing to convert",
              file=sys.stderr)
        return 2
    if not exporting and not args.output.endswith(".npz"):
        # direction follows the extensions: a .pth input means IMPORT, and
        # np.savez would silently append .npz to the output name — refuse
        # rather than write a file the user didn't name
        print(f"cp360-convert: input {args.input} is a torch checkpoint, so "
              f"the output is our .npz format — name it *.npz "
              f"(got {args.output})", file=sys.stderr)
        return 2

    if exporting:
        try:
            params = tw.load_npz(args.input)
        except FileNotFoundError:
            print(f"cp360-convert: no such file: {args.input}", file=sys.stderr)
            return 2
        kind = args.kind
        if kind == "auto":
            kind = sniff_kind_npz(tw.flatten_params(params).keys())
            print(f"cp360-convert: sniffed kind={kind}", file=sys.stderr)
        if kind in ("vgg16", "mobilenet_v2"):
            print(f"cp360-convert: export to .pth is not supported for "
                  f"{kind} (the reference repo has no consumer for it; "
                  f"resnet and clstm export are)", file=sys.stderr)
            return 2
        try:
            if kind == "resnet":
                sd = tw.export_resnet_state_dict(params, args.arch)
            else:
                sd = tw.export_clstm_state_dict(params)
        except (KeyError, ValueError, TypeError) as e:
            print(f"cp360-convert: {args.input} does not look like a {kind} "
                  f"params tree: {e}", file=sys.stderr)
            return 2
        import torch
        import numpy as np

        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   args.output)
        print(f"cp360-convert: exported {len(sd)} tensors -> {args.output} "
              f"(reference-compatible {kind} state dict)", file=sys.stderr)
        return 0

    try:
        sd = tw.load_torch_state_dict(args.input)
    except FileNotFoundError:
        print(f"cp360-convert: no such file: {args.input}", file=sys.stderr)
        return 2
    kind = args.kind
    if kind == "auto":
        kind = sniff_kind(sd.keys())
        print(f"cp360-convert: sniffed kind={kind}", file=sys.stderr)
    try:
        if kind == "resnet":
            params = tw.convert_resnet_state_dict(sd, args.arch)
        elif kind == "mobilenet_v2":
            from cp360_tpu.models.mobilenet import convert_mobilenet_v2

            params = convert_mobilenet_v2(sd)
        elif kind == "vgg16":
            import jax

            from cp360_tpu.models.vgg import (
                convert_vgg16_bn_features,
                init_vgg16_params,
            )

            init = jax.device_get(init_vgg16_params(jax.random.PRNGKey(0)))
            params = convert_vgg16_bn_features(sd, init)
        else:
            params = tw.convert_clstm_state_dict(sd)
    except (KeyError, ValueError) as e:
        print(f"cp360-convert: {args.input} does not look like a {kind} "
              f"({args.arch if kind == 'resnet' else '6-tensor'}) state dict: "
              f"missing/invalid {e}", file=sys.stderr)
        return 2
    tw.save_npz(args.output, params)
    n = len(tw.flatten_params(params))
    print(f"cp360-convert: wrote {n} arrays -> {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
