#!/usr/bin/env python
"""Generator-disjoint training/evaluation (VERDICT r1 §next-2).

Trains each model family on ONE synthesizer family and scores it on the
others (train-on-KS → eval-on-additive/FM and the reverse), so the
accuracy claim is no longer circular in the synthesis engine. The FM
family is never trained on by any shipped checkpoint — it is the
unseen-timbre column everywhere.

Usage: python tools/cross_family_eval.py [--variants 12] [--epochs 15]
       [--model cnn|mlp|all] [--platform cpu|tpu] [--out report.json]
"""
import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TRAIN_FAMILIES = ("ks", "additive")
EVAL_FAMILIES = ("ks", "additive", "fm")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=int, default=12)
    ap.add_argument("--eval_variants", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--model", default="all", choices=["cnn", "mlp", "all"])
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--train_seed", type=int, default=42)
    ap.add_argument("--eval_seed", type=int, default=777)
    ap.add_argument("--target_sr", type=int, default=11025)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        # CLAUDE.md: every TPU run sets the persistent compilation
        # cache - first compiles are minutes through the tunnel
        from gat_tpu.utils.jaxenv import enable_compilation_cache
        enable_compilation_cache()

    import numpy as np
    from gat_tpu.config import MFCC_CONFIG, MELSPEC_CONFIG
    from gat_tpu.data.synth import synthesize_note_dataset
    from gat_tpu.data.loader import AudioDatasetLoader
    from gat_tpu.features import FeatureBuilder
    from gat_tpu.train import TrainingManager, ArrayDataLoader

    tmp = Path(tempfile.mkdtemp())
    models = ["cnn", "mlp"] if args.model == "all" else [args.model]
    t0 = time.time()

    # one eval set per family, shared across all trained models
    eval_dirs = {}
    for fam in EVAL_FAMILIES:
        eval_dirs[fam] = synthesize_note_dataset(
            tmp / f"eval_{fam}", family=fam,
            variants_per_class=args.eval_variants, seed=args.eval_seed,
            verbose=False)

    _raw_feats: dict = {}  # (model_kind, fam) → (X_raw, y, reverse_map)

    def eval_features(trainer, model_kind, fam):
        """Raw features are extracted once per (model kind, family) and
        cached — only the MLP's scaler transform is trainer-specific."""
        key = (model_kind, fam)
        if key not in _raw_feats:
            loader = AudioDatasetLoader([eval_dirs[fam]],
                                        target_sr=args.target_sr,
                                        duration=0.5)
            builder = FeatureBuilder()
            if model_kind == "mlp":
                X, y, _, rmap = builder.extract_mfcc_features(
                    loader, MFCC_CONFIG.N_MFCC,
                    MFCC_CONFIG.NORMALIZE_AUDIO_VOLUME)
            else:
                X, y, _, rmap = builder.extract_melspec_features(
                    loader, MELSPEC_CONFIG.N_MELS, MELSPEC_CONFIG.N_FFT,
                    MELSPEC_CONFIG.HOP_LENGTH,
                    MELSPEC_CONFIG.NORMALIZE_AUDIO_VOLUME)
            _raw_feats[key] = (X, y, rmap)
        X, y, rmap = _raw_feats[key]
        assert rmap == trainer.reverse_map, \
            "class maps diverged between train and eval datasets"
        if model_kind == "mlp" and trainer.scaler is not None:
            X = np.asarray(trainer.scaler.transform(X))
        return ArrayDataLoader(X, y, 256, shuffle=False)

    # one training set per family, shared by both model kinds
    train_dirs = {fam: synthesize_note_dataset(
        tmp / f"train_{fam}", family=fam,
        variants_per_class=args.variants, seed=args.train_seed,
        verbose=False) for fam in TRAIN_FAMILIES}

    report = {"variants": args.variants, "epochs": args.epochs,
              "eval_seed": args.eval_seed, "results": {}}
    for model_kind in models:
        for train_fam in TRAIN_FAMILIES:
            ds = train_dirs[train_fam]
            mgr = TrainingManager(target_sr=args.target_sr)
            train = (mgr.train_cnn if model_kind == "cnn"
                     else mgr.train_mlp)
            trainer = train(dataset=ds, epochs=args.epochs,
                            seed=args.train_seed, save=False,
                            verbose=False)
            row = {}
            for eval_fam in EVAL_FAMILIES:
                acc, _ = trainer.evaluate(
                    eval_features(trainer, model_kind, eval_fam))
                row[eval_fam] = round(float(acc), 4)
            key = f"{model_kind}_trained_on_{train_fam}"
            report["results"][key] = row
            print(f"[cross_family] {key}: " + "  ".join(
                f"{f}={row[f]:.4f}" for f in EVAL_FAMILIES))

    report["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report, indent=2))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
