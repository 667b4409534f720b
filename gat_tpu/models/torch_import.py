"""Import reference PyTorch checkpoints into gat_tpu parameter trees.

The reference ships a trained MLP checkpoint (version_1/data/checkpoints/
mlp/mlp_v1.0.0.ckpt; schema at prototyping/source/training/
mlp_trainer.py:445-476). This module reads that pickle (torch is a
test-time-only dependency, gated inside the functions), converts the
`state_dict` weights to flax param trees, and repackages the whole
checkpoint into this framework's self-describing format — enabling
weight-level parity tests against the original model.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from .mlp import mlp_dims

__all__ = ["load_reference_ckpt", "mlp_params_from_state_dict",
           "cnn_params_from_state_dict", "reference_ckpt_to_native"]


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def load_reference_ckpt(path) -> dict:
    """Unpickle a reference .ckpt (handles Windows-origin Path objects).

    The pickle contains a StandardScaler fitted under sklearn 1.6.1;
    unpickling under a newer sklearn raises InconsistentVersionWarning.
    That warning is owned here: the converter reads ONLY the fitted
    `mean_`/`scale_` arrays (plain numpy attributes whose layout is
    stable across sklearn versions) and never calls scaler methods, so
    the version skew cannot affect behavior — the arrays are regression-
    tested against stored values in tests/test_models.py."""
    import pathlib
    import warnings
    import torch
    if not hasattr(pathlib, "_gat_winpath_patch"):
        pathlib.WindowsPath = pathlib.PosixPath  # ckpt saved on Windows
        pathlib._gat_winpath_patch = True
    with warnings.catch_warnings():
        try:
            from sklearn.exceptions import InconsistentVersionWarning
            warnings.simplefilter("ignore", InconsistentVersionWarning)
        except ImportError:  # sklearn absent: nothing to silence
            pass
        return torch.load(path, map_location="cpu", weights_only=False)


def mlp_params_from_state_dict(state_dict: Mapping[str, Any],
                               hidden_dim: int, num_hidden_layers: int,
                               dropout: float = 0.1) -> dict:
    """torch `net.{i}.weight/bias` → flax {dense_i, ln_i, out} tree.

    Layer index spacing in the torch Sequential is 4 with dropout
    (Linear, LayerNorm, LeakyReLU, Dropout) else 3."""
    dims = mlp_dims(hidden_dim, num_hidden_layers)
    stride = 4 if dropout > 0 else 3
    params: dict[str, Any] = {}
    for j in range(len(dims)):
        base = j * stride
        params[f"dense_{j}"] = {
            "kernel": _np(state_dict[f"net.{base}.weight"]).T,
            "bias": _np(state_dict[f"net.{base}.bias"]),
        }
        params[f"ln_{j}"] = {
            "scale": _np(state_dict[f"net.{base + 1}.weight"]),
            "bias": _np(state_dict[f"net.{base + 1}.bias"]),
        }
    final = len(dims) * stride
    params["out"] = {
        "kernel": _np(state_dict[f"net.{final}.weight"]).T,
        "bias": _np(state_dict[f"net.{final}.bias"]),
    }
    return params


def cnn_params_from_state_dict(state_dict: Mapping[str, Any],
                               num_blocks: int = 3,
                               dropout: float = 0.1,
                               use_batchnorm: bool = True,
                               use_maxpool: bool = True) -> tuple[dict, dict]:
    """torch CNN state_dict → (params, batch_stats) flax trees.

    torch Conv2d weight (O, I, kH, kW) → flax (kH, kW, I, O); the
    classifier Dense weights transpose directly because our flatten keeps
    torch's NCHW ordering (see models/cnn.py)."""
    params: dict[str, Any] = {}
    batch_stats: dict[str, Any] = {}
    idx = 0
    for b in range(num_blocks):
        w = _np(state_dict[f"features.{idx}.weight"])
        params[f"conv_{b}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": _np(state_dict[f"features.{idx}.bias"]),
        }
        idx += 1
        if use_batchnorm:
            params[f"bn_{b}"] = {
                "scale": _np(state_dict[f"features.{idx}.weight"]),
                "bias": _np(state_dict[f"features.{idx}.bias"]),
            }
            batch_stats[f"bn_{b}"] = {
                "mean": _np(state_dict[f"features.{idx}.running_mean"]),
                "var": _np(state_dict[f"features.{idx}.running_var"]),
            }
            idx += 1
        idx += 1  # LeakyReLU
        if use_maxpool:
            idx += 1
        if dropout > 0:
            idx += 1
    # classifier indices: Flatten(0), Dense(1), LeakyReLU(2), Dropout(3),
    # Dense(4) — or Dense at 1 only when hidden_dim is falsy
    out_idx = 4 if dropout > 0 else 3
    key = f"classifier.{out_idx}.weight"
    if key not in state_dict:  # no hidden layer variant
        key = "classifier.1.weight"
    elif "classifier.1.weight" in state_dict:
        # the hidden Dense exists ONLY when an output Dense sits after
        # it — in the no-hidden variant classifier.1 IS the output
        # layer, and emitting it as 'fc' too would pollute the param
        # tree with a layer the target CNN(hidden_dim=None) doesn't have
        params["fc"] = {
            "kernel": _np(state_dict["classifier.1.weight"]).T,
            "bias": _np(state_dict["classifier.1.bias"]),
        }
    params["out"] = {
        "kernel": _np(state_dict[key]).T,
        "bias": _np(state_dict[key.replace("weight", "bias")]),
    }
    return params, batch_stats


def reference_ckpt_to_native(path) -> dict:
    """Reference .ckpt → this framework's checkpoint dict (same logical
    schema: embedded config, params, scaler arrays, reverse_map,
    histories — SURVEY §5.4). Ready for gat_tpu.train.checkpoint.save."""
    ck = load_reference_ckpt(path)
    model_type = ck["meta"]["model_type"]
    init_args = dict(ck["model_init_args"])
    if model_type == "mlp":
        params = mlp_params_from_state_dict(
            ck["model"], init_args["hidden_dim"],
            init_args["num_hidden_layers"], init_args.get("dropout", 0.1))
        variables = {"params": params}
    else:
        params, batch_stats = cnn_params_from_state_dict(
            ck["model"], init_args.get("num_blocks", 3),
            init_args.get("dropout", 0.1),
            # layout flags come from the checkpoint's own init args: a
            # no-batchnorm/no-maxpool reference model shifts every
            # features.N index, and assuming the default layout would
            # mis-map (or KeyError on) the conv/bn weights
            use_batchnorm=bool(init_args.get("use_batchnorm", True)),
            use_maxpool=bool(init_args.get("use_maxpool", True)))
        variables = {"params": params, "batch_stats": batch_stats}

    cfg = ck.get("config", {})
    # strip non-JSON values (the reference embeds WindowsPath objects)
    model_params = dict(cfg.get("model", {}).get("params", {}))
    model_params = {k: (str(v) if not isinstance(
        v, (int, float, bool, str, type(None))) else v)
        for k, v in model_params.items()}

    scaler = ck.get("scaler")
    native = {
        "meta": {
            "config_version": ck["meta"].get("config_version", "1.0.0"),
            "datetime": ck["meta"].get("datetime", ""),
            "model_type": model_type,
            "imported_from": str(path),
        },
        "config": {
            "features": cfg.get("features", {}),
            "model": {"type": model_type, "params": model_params},
            "target_sr": cfg.get("target_sr"),
            "clip_length": cfg.get("clip_length"),
        },
        "variables": variables,
        "model_init_args": init_args,
        "train_loss_history": list(ck.get("train_loss_history", [])),
        "train_accuracy_history": list(ck.get("train_accuracy_history", [])),
        "val_loss_history": list(ck.get("val_loss_history", [])),
        "val_accuracy_history": list(ck.get("val_accuracy_history", [])),
        "epoch": int(ck.get("epoch", 0)),
        "reverse_map": {int(k): str(v)
                        for k, v in ck.get("reverse_map", {}).items()},
        "num_classes": int(ck.get("num_classes", 0)),
        "class_names": [str(c) for c in ck.get("class_names", [])],
    }
    if scaler is not None:
        native["scaler"] = {
            "mean": np.asarray(scaler.mean_, np.float32),
            "scale": np.asarray(scaler.scale_, np.float32),
        }
    return native
