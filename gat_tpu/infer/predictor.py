"""Ensemble note predictor: weighted MLP+CNN softmax voting.

Behavioral spec: version_1/source/note_predictor.py (C16). Models are
rebuilt from the checkpoint's `model_init_args`, weights come from the
checkpoint's variables, and predictions blend softmax probabilities
0.2·MLP + 0.8·CNN before argmax → reverse_map labels. The blended
forward of both models is a single jit graph; `predict_debug` sweeps
ensemble weights (ref note_predictor.py:138-157) reusing it (the weight
is a traced scalar, so the sweep costs no recompiles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import MLP, CNN

__all__ = ["NotePredictor"]


class NotePredictor:
    def __init__(self, cnn_weight: float = 0.80):
        self.mlp = None
        self.cnn = None
        self.mlp_variables = None
        self.cnn_variables = None
        self.reverse_map: dict[int, str] | None = None
        self.cnn_weight = cnn_weight
        self.mlp_weight = 1.0 - cnn_weight

    # ----- loading -------------------------------------------------------
    def load_models(self, mlp_ckpt_data: dict | None = None,
                    cnn_ckpt_data: dict | None = None) -> None:
        """Build models from checkpoint init args + variables
        (ref note_predictor.py:29-80)."""
        if mlp_ckpt_data is not None:
            if "variables" not in mlp_ckpt_data:
                raise KeyError(
                    "[load_models] MLP checkpoint missing 'variables' field")
            args = dict(mlp_ckpt_data["model_init_args"])
            self.mlp = MLP(**args)
            self.mlp_variables = jax.tree_util.tree_map(
                jnp.asarray, mlp_ckpt_data["variables"])
            print("[load_models] Loaded MLP model")
            if self.reverse_map is None:
                rm = mlp_ckpt_data.get("reverse_map")
                if rm is not None:
                    self.reverse_map = {int(k): v for k, v in rm.items()}
                    print("[load_models] Loaded reverse_map from MLP "
                          "checkpoint.")
        if cnn_ckpt_data is not None:
            if "variables" not in cnn_ckpt_data:
                raise KeyError(
                    "[load_models] CNN checkpoint missing 'variables' field")
            args = dict(cnn_ckpt_data["model_init_args"])
            if "adaptive_pool" in args:
                args["adaptive_pool"] = tuple(args["adaptive_pool"])
            self.cnn = CNN(**args)
            self.cnn_variables = jax.tree_util.tree_map(
                jnp.asarray, cnn_ckpt_data["variables"])
            print("[load_models] Loaded CNN model")
            if self.reverse_map is None:
                rm = cnn_ckpt_data.get("reverse_map")
                if rm is not None:
                    self.reverse_map = {int(k): v for k, v in rm.items()}
        if self.reverse_map is None:
            print("[load_models] Warning: reverse_map is not set; "
                  "predictions will be class indices only.")

    # ----- forward graphs ------------------------------------------------
    @functools.cached_property
    def _mlp_probs_fn(self):
        @jax.jit
        def f(variables, x):
            return jax.nn.softmax(self.mlp.apply(variables, x), axis=-1)
        return f

    @functools.cached_property
    def _cnn_probs_fn(self):
        @jax.jit
        def f(variables, x):
            return jax.nn.softmax(self.cnn.apply(variables, x), axis=-1)
        return f

    @staticmethod
    def _to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
        """Accept either native NHWC (N, M, T, 1) or the reference's NCHW
        (N, 1, M, T) mel-spec layout."""
        if x.ndim != 4:
            raise ValueError(f"[predict] melspec must be 4-D, got {x.shape}")
        if x.shape[1] == 1 and x.shape[-1] != 1:
            return jnp.transpose(x, (0, 2, 3, 1))
        return x

    def ensemble_probs(self, mfcc_features=None, melspec_features=None,
                       cnn_weight: float | None = None):
        """Blended class probabilities plus per-model probs (device)."""
        mlp_probs = cnn_probs = None
        if mfcc_features is not None:
            if self.mlp is None:
                raise RuntimeError("[predict] MLP not loaded")
            x = jnp.asarray(mfcc_features, jnp.float32)
            mlp_probs = self._mlp_probs_fn(self.mlp_variables, x)
        if melspec_features is not None:
            if self.cnn is None:
                raise RuntimeError("[predict] CNN not loaded")
            x = self._to_nhwc(jnp.asarray(melspec_features, jnp.float32))
            cnn_probs = self._cnn_probs_fn(self.cnn_variables, x)

        w = self.cnn_weight if cnn_weight is None else cnn_weight
        if mlp_probs is not None and cnn_probs is not None:
            probs = (1.0 - w) * mlp_probs + w * cnn_probs
        elif cnn_probs is not None:
            probs = cnn_probs
        elif mlp_probs is not None:
            probs = mlp_probs
        else:
            raise ValueError(
                "[predict] Must provide either mfcc_features or "
                "melspec_features")
        return probs, mlp_probs, cnn_probs

    # ----- public prediction API -----------------------------------------
    def predict(self, mfcc_features=None, melspec_features=None) -> dict:
        """Ref note_predictor.py:84-135 result schema: indices, labels,
        confidences, blended probs, per-model probs."""
        probs, mlp_probs, cnn_probs = self.ensemble_probs(
            mfcc_features, melspec_features)
        probs = np.asarray(probs)
        idx = probs.argmax(axis=1)
        labels = ([self.reverse_map[int(i)] for i in idx]
                  if self.reverse_map else [int(i) for i in idx])
        conf = probs[np.arange(len(idx)), idx]
        return {
            "indices": idx,
            "labels": labels,
            "confidences": conf,
            "probs": probs,
            "per_model_probs": {
                "mlp": None if mlp_probs is None else np.asarray(mlp_probs),
                "cnn": None if cnn_probs is None else np.asarray(cnn_probs),
            },
        }

    def predict_debug(self, test_weights, mfcc_features=None,
                      melspec_features=None):
        """Sweep CNN ensemble weights (ref note_predictor.py:138-157)."""
        out = []
        for w in test_weights:
            probs, mlp_p, cnn_p = self.ensemble_probs(
                mfcc_features, melspec_features, cnn_weight=float(w))
            probs = np.asarray(probs)
            idx = probs.argmax(axis=1)
            labels = ([self.reverse_map[int(i)] for i in idx]
                      if self.reverse_map else [int(i) for i in idx])
            conf = probs[np.arange(len(idx)), idx]
            pred = {"indices": idx, "labels": labels, "confidences": conf,
                    "probs": probs,
                    "per_model_probs": {
                        "mlp": None if mlp_p is None else np.asarray(mlp_p),
                        "cnn": None if cnn_p is None else np.asarray(cnn_p)}}
            out.append((w, pred))
            print("weight: ", w)
            print(pred["labels"], pred["confidences"])
            print()
        return out
