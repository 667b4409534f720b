"""Self-describing checkpoints (SURVEY §5.4 schema, C15).

Same logical content as the reference's torch.save pickle
(prototyping/source/training/mlp_trainer.py:445-476): meta, embedded
feature/model config, weights, optimizer state, training histories, label
map, class names, and the fitted feature scaler — but stored as a single
.npz: arrays under '/'-joined keypaths + one JSON header. No pickle, no
framework objects — exactly the brittleness the reference's 12-08-25
config refactor was fixing (ref prototyping/source/config.py:6-41), taken
to its conclusion.

`load_checkpoint` transparently reads reference .ckpt files too (torch
zip archives) via the torch_import converter, so the shipped MLP weights
drop straight into this framework.
"""
from __future__ import annotations

import json
import zipfile
from pathlib import Path

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "flatten_tree",
           "unflatten_tree"]

_SEP = "/"


def flatten_tree(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


_ARRAY_FIELDS = ("variables", "scaler", "opt_state")


def save_checkpoint(path, ckpt: dict) -> Path:
    """Write a checkpoint dict. Array-bearing subtrees (variables, scaler,
    opt_state) are stored as npz entries; everything else goes into the
    JSON header. Returns the path actually written: np.savez appends
    '.npz' to any other suffix, so the name is normalized up front — a
    printed/returned path must never point at a file that doesn't exist."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    header: dict = {}
    for k, v in ckpt.items():
        if k in _ARRAY_FIELDS and v is not None:
            arrays.update(flatten_tree({k: v}))
        else:
            header[k] = v
    # reverse_map keys must survive JSON (int → str round trip)
    payload = {"__meta__": json.dumps(header, default=str)}
    payload.update(arrays)
    np.savez_compressed(path, **payload)
    print(f"[save_checkpoint] Checkpoint saved to {path}")
    return path


def _is_torch_zip(path: Path) -> bool:
    try:
        with open(path, "rb") as f:
            magic = f.read(2)
        if magic != b"PK":
            return False
        with zipfile.ZipFile(path) as z:
            return any(n.endswith("data.pkl") for n in z.namelist())
    except Exception:
        return False


def load_checkpoint(path) -> dict:
    """Read a native .npz checkpoint — or a reference torch .ckpt, which
    is converted on the fly (ref schema → native schema)."""
    path = Path(path)
    if not path.is_file():
        raise FileNotFoundError(f"[load_checkpoint] No file named: {path}")
    if _is_torch_zip(path):
        from ..models.torch_import import reference_ckpt_to_native
        return reference_ckpt_to_native(path)

    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    ckpt = dict(header)
    ckpt.update(unflatten_tree(flat))
    if "reverse_map" in ckpt and isinstance(ckpt["reverse_map"], dict):
        ckpt["reverse_map"] = {int(k): v
                               for k, v in ckpt["reverse_map"].items()}
    return ckpt
