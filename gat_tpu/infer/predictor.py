"""Ensemble note predictor: weighted MLP+CNN softmax voting.

Behavioral spec: version_1/source/note_predictor.py (C16). Models are
rebuilt from the checkpoint's `model_init_args`, weights come from the
checkpoint's variables, and predictions blend softmax probabilities
0.2·MLP + 0.8·CNN before argmax → reverse_map labels. Both model
forwards, the blend, and the optional pitch prior run as ONE jit graph
(`_ensemble_fn`) — a single device dispatch with the blend weight as a
traced scalar; `predict_debug` sweeps ensemble weights (ref
note_predictor.py:138-157) by re-blending the per-model probs on host
from one forward pass.

Beyond the reference: an optional YIN pitch prior (`pitch_prior_weight`
> 0) mixes a Gaussian-over-semitone-distance distribution from the
clip's estimated f0 into the blend before argmax. The classifiers key
partly on timbre and degrade on synthesis families they never saw
(cross_family_eval.py), while the pitch tracker is timbre-blind — the
prior restores unseen-timbre accuracy at the cost of one (shared) YIN
pass. Off by default: the reference blend stays the parity behavior.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import MLP, CNN

__all__ = ["NotePredictor", "class_midi_values", "apply_pitch_prior"]


def class_midi_values(reverse_map: dict[int, str]) -> np.ndarray:
    """(C,) MIDI number per class index, from the SPN label map."""
    from ..ops.pitch import note_to_midi
    return np.asarray([float(note_to_midi(reverse_map[i]))
                       for i in range(len(reverse_map))], np.float32)


def apply_pitch_prior(probs: jax.Array, pitch_hz: jax.Array,
                      class_midi: np.ndarray, weight: float = 0.4,
                      sigma: float = 0.5) -> jax.Array:
    """Mixture blend: (1-w)·probs + w·softmax(-(Δsemitones)²/(2σ²)).

    The pitch tracker enters as a third ensemble member rather than a
    multiplicative prior: a product lets YIN's own errors (~7% octave
    slips) VETO a confident, correct classifier, while a sub-0.5-weight
    mixture can only flip a disagreement the classifiers were already
    unsure about. Swept on held-out family/stressor sets: w=0.4, σ=0.5
    keeps the seen families at 100% and lifts unseen-FM to 100%
    (tools/evaluate.py --suite full). Non-finite/non-positive pitch
    estimates leave probs untouched."""
    hz = jnp.asarray(pitch_hz, jnp.float32)
    valid = jnp.isfinite(hz) & (hz > 0)
    midi_f = 12.0 * jnp.log2(jnp.where(valid, hz, 440.0) / 440.0) + 69.0
    d = midi_f[..., None] - jnp.asarray(class_midi)
    p_yin = jax.nn.softmax(-0.5 * (d / sigma) ** 2, axis=-1)
    post = (1.0 - weight) * probs + weight * p_yin
    return jnp.where(valid[..., None], post, probs)


class NotePredictor:
    def __init__(self, cnn_weight: float = 0.80,
                 pitch_prior_weight: float = 0.0,
                 pitch_prior_sigma: float = 0.5,
                 cnn_dtype=None):
        self.mlp = None
        self.cnn = None
        self.mlp_variables = None
        self.cnn_variables = None
        self.reverse_map: dict[int, str] | None = None
        self.cnn_weight = cnn_weight
        self.pitch_prior_weight = pitch_prior_weight
        self.pitch_prior_sigma = pitch_prior_sigma
        # CNN inference compute dtype override (weights stay f32 in the
        # checkpoint; flax casts per-op). bfloat16 is the AMP-style
        # inference analog — A/B'd on v5e in docs/PERF.md.
        self.cnn_dtype = cnn_dtype
        self._ensemble_cache: dict = {}

    @property
    def mlp_weight(self) -> float:
        """Always the complement of `cnn_weight` — a property so a
        post-construction `cnn_weight` change (supported by the fused
        program cache keys) can never leave this stale."""
        return 1.0 - self.cnn_weight

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
            if self.cnn_dtype is not None:
                args["dtype"] = self.cnn_dtype
            self.cnn = CNN(**args)
            self.cnn_variables = jax.tree_util.tree_map(
                jnp.asarray, cnn_ckpt_data["variables"])
            print("[load_models] Loaded CNN model")
            rm = cnn_ckpt_data.get("reverse_map")
            if rm is not None:
                rm = {int(k): v for k, v in rm.items()}
                if self.reverse_map is None:
                    self.reverse_map = rm
                elif rm != self.reverse_map:
                    # the ensemble adds the two softmax vectors
                    # POSITIONALLY — same-count different-order label maps
                    # would blend misaligned classes and mislabel silently
                    raise ValueError(
                        "[load_models] MLP and CNN checkpoints disagree on "
                        "the class label map (reverse_map); these models "
                        "cannot be ensembled. MLP-only operation: "
                        "Transcriber(require_cnn=False) with no cnn_ckpt.")
        if self.reverse_map is None:
            print("[load_models] Warning: reverse_map is not set; "
                  "predictions will be class indices only.")

    # ----- forward graphs ------------------------------------------------
    def _ensemble_fn(self, has_mlp: bool, has_cnn: bool, has_prior: bool):
        """ONE jitted graph for the whole feature-level ensemble: both
        model forwards, the softmax blend, and (optionally) the pitch
        prior — a single device dispatch instead of one per model plus
        eager blending (each extra dispatch is a hop, ~30 ms through a
        tunneled TPU). The blend weight `w` is a TRACED scalar, so
        `predict_debug`'s weight sweep reuses the same executable with
        no recompiles. Cached per (presence pattern, prior config, model
        identity); weights are call arguments, so a trainer swapping
        variables hits the same program."""
        key = (has_mlp, has_cnn, has_prior, id(self.mlp), id(self.cnn),
               self.pitch_prior_weight, self.pitch_prior_sigma,
               (tuple(sorted(self.reverse_map.items()))
                if has_prior and self.reverse_map else None))
        fn = self._ensemble_cache.get(key)
        if fn is not None:
            return fn
        mlp, cnn = self.mlp, self.cnn
        class_midi = (class_midi_values(self.reverse_map)
                      if has_prior else None)
        prior_w, prior_sigma = (self.pitch_prior_weight,
                                self.pitch_prior_sigma)

        @jax.jit
        def f(mlp_vars, cnn_vars, mfcc, mel, w, pitch_hz):
            mlp_probs = (jax.nn.softmax(mlp.apply(mlp_vars, mfcc), axis=-1)
                         if has_mlp else None)
            cnn_probs = (jax.nn.softmax(cnn.apply(cnn_vars, mel), axis=-1)
                         if has_cnn else None)
            if has_mlp and has_cnn:
                probs = (1.0 - w) * mlp_probs + w * cnn_probs
            else:
                probs = cnn_probs if has_cnn else mlp_probs
            if has_prior:
                probs = apply_pitch_prior(probs, pitch_hz, class_midi,
                                          weight=prior_w,
                                          sigma=prior_sigma)
            return probs, mlp_probs, cnn_probs

        self._ensemble_cache[key] = f
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
                       cnn_weight: float | None = None, pitch_hz=None):
        """Blended class probabilities plus per-model probs (device),
        computed by ONE jit dispatch (`_ensemble_fn`). When the pitch
        prior is enabled and `pitch_hz` (N,) is given, the blend is
        re-weighted toward classes near the estimated f0."""
        has_mlp = mfcc_features is not None
        has_cnn = melspec_features is not None
        if has_mlp and self.mlp is None:
            raise RuntimeError("[predict] MLP not loaded")
        if has_cnn and self.cnn is None:
            raise RuntimeError("[predict] CNN not loaded")
        if not has_mlp and not has_cnn:
            raise ValueError(
                "[predict] Must provide either mfcc_features or "
                "melspec_features")
        has_prior = (pitch_hz is not None and self.pitch_prior_weight > 0
                     and bool(self.reverse_map))
        w = self.cnn_weight if cnn_weight is None else cnn_weight
        fn = self._ensemble_fn(has_mlp, has_cnn, has_prior)
        return fn(self.mlp_variables if has_mlp else None,
                  self.cnn_variables if has_cnn else None,
                  jnp.asarray(mfcc_features, jnp.float32)
                  if has_mlp else None,
                  self._to_nhwc(jnp.asarray(melspec_features, jnp.float32))
                  if has_cnn else None,
                  jnp.float32(w),
                  jnp.asarray(pitch_hz, jnp.float32)
                  if has_prior else None)

    # ----- public prediction API -----------------------------------------
    def _result_dict(self, probs, mlp_probs, cnn_probs) -> dict:
        """The result schema (ref note_predictor.py:84-135): one device→
        host transfer of the blended probs, argmax → reverse_map labels,
        per-model probs alongside. Shared by predict/predict_debug (the
        file-level analog is Transcriber._build_result, which adds the
        kept-mask compaction and onset fields)."""
        # one transfer for all three prob arrays (per-array np.asarray on
        # device arrays would be three blocking tunnel round trips)
        probs, mlp_probs, cnn_probs = jax.device_get(
            (probs, mlp_probs, cnn_probs))
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

    def predict(self, mfcc_features=None, melspec_features=None,
                pitch_hz=None) -> dict:
        """Ref note_predictor.py:84-135 result schema: indices, labels,
        confidences, blended probs, per-model probs."""
        probs, mlp_probs, cnn_probs = self.ensemble_probs(
            mfcc_features, melspec_features, pitch_hz=pitch_hz)
        return self._result_dict(probs, mlp_probs, cnn_probs)

    def predict_debug(self, test_weights, mfcc_features=None,
                      melspec_features=None):
        """Sweep CNN ensemble weights (ref note_predictor.py:138-157).
        The model forwards run ONCE (one dispatch, one transfer); each
        swept weight re-blends the per-model probs on host — the blend
        is a 2-term affine combination, so no device work or recompile
        is needed per weight."""
        probs, mlp_probs, cnn_probs = jax.device_get(self.ensemble_probs(
            mfcc_features, melspec_features))
        out = []
        for w in test_weights:
            if mlp_probs is not None and cnn_probs is not None:
                blended = ((1.0 - float(w)) * np.asarray(mlp_probs)
                           + float(w) * np.asarray(cnn_probs))
            else:
                blended = np.asarray(probs)  # single-model: w is moot
            pred = self._result_dict(blended, mlp_probs, cnn_probs)
            out.append((w, pred))
            print("weight: ", w)
            print(pred["labels"], pred["confidences"])
            print()
        return out
