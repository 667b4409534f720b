#!/usr/bin/env python
"""Note-accuracy evaluation harness (BASELINE.md metric trio: throughput,
latency, note accuracy).

Synthesizes held-out evaluation sets (different seed from training), runs
the shipped ensemble AND each model alone AND the YIN DSP baseline over
them, and reports per-system accuracy + the confusion summary the
reference prints after training (ref mlp_trainer.py:225-270).

Two suites:
  quick — one mixed-family set (the round-1 behavior).
  full  — de-circularized evaluation (VERDICT r1 §next-2): per-family
          sets including the FM family NO shipped model ever trained on,
          plus playing-style stressor sets (vibrato, pitch bend, detune,
          tremolo) the training pipeline never applied.

Usage: python tools/evaluate.py [--variants 8] [--seed 777]
       [--suite quick|full] [--platform cpu|tpu] [--out report.json]
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# evaluation sets for --suite full: name → synthesize_note_dataset kwargs
FULL_SUITE = {
    "mixed": {},
    "ks_only": {"family": "ks"},
    "additive_only": {"family": "additive"},
    "fm_unseen_family": {"family": "fm"},
    "vibrato": {"stressor": "vibrato"},
    "pitch_bend": {"stressor": "bend"},
    "detune_25c": {"stressor": "detune"},
    "tremolo": {"stressor": "tremolo"},
    "fm_vibrato": {"family": "fm", "stressor": "vibrato"},
}


def evaluate_set(transcriber, root, variants: int, seed: int,
                 **synth_kwargs) -> dict:
    """Synthesize one eval set and score every system on it."""
    import numpy as np
    import jax.numpy as jnp
    from gat_tpu.data.synth import synthesize_note_dataset
    from gat_tpu.data.loader import AudioDatasetLoader
    from gat_tpu.ops.yin import yin_pitch, estimate_note

    synthesize_note_dataset(root, variants_per_class=variants, seed=seed,
                            verbose=False, **synth_kwargs)
    loader = AudioDatasetLoader([root], target_sr=transcriber.ckpt_sr,
                                duration=transcriber.clip_length)
    wavs, _, labels, _ = loader.load_audio_dataset(pad_to_max=True)
    clips = jnp.asarray(np.stack(wavs))

    result = transcriber.transcribe_clips(clips)
    rm = transcriber.predictor.reverse_map
    name_to_idx = {v: k for k, v in rm.items()}
    y_map = np.asarray([name_to_idx[l] for l in labels])

    def acc(p):
        return (round(float((p.argmax(axis=1) == y_map).mean()), 4)
                if p is not None else None)

    yin_hz = np.asarray(yin_pitch(clips, transcriber.ckpt_sr))
    yin_names = [estimate_note(h, unicode=False)[1] for h in yin_hz]
    yin_acc = float(np.mean([a == b for a, b in zip(yin_names, labels)]))

    # ensemble with the YIN pitch prior applied (opt-in robustness mode)
    from gat_tpu.infer.predictor import apply_pitch_prior, class_midi_values
    prior_probs = np.asarray(apply_pitch_prior(
        result["probs"], yin_hz, class_midi_values(rm)))

    return {
        "n_clips": int(len(labels)),
        "ensemble_accuracy": acc(result["probs"]),
        "ensemble_prior_accuracy": acc(prior_probs),
        "mlp_accuracy": acc(result["per_model_probs"]["mlp"]),
        "cnn_accuracy": acc(result["per_model_probs"]["cnn"]),
        "yin_accuracy": round(yin_acc, 4),
        "_result": result,
        "_labels": labels,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=int, default=8)
    ap.add_argument("--seed", type=int, default=777)  # != training seed
    ap.add_argument("--suite", default="quick", choices=["quick", "full"])
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", type=Path, default=None,
                    help="optional JSON report path")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import tempfile
    from gat_tpu.infer import Transcriber
    from gat_tpu.train.metrics import classification_report

    tmp = Path(tempfile.mkdtemp())
    t0 = time.time()
    t = Transcriber()

    sets = {"mixed": {}} if args.suite == "quick" else FULL_SUITE
    report = {"suite": args.suite, "eval_seed": args.seed, "sets": {}}
    base = None
    for name, kwargs in sets.items():
        res = evaluate_set(t, tmp / name, args.variants, args.seed,
                           **kwargs)
        if base is None:
            base = res
        report["sets"][name] = {k: v for k, v in res.items()
                                if not k.startswith("_")}
        print(f"[evaluate] {name:18s} ens={res['ensemble_accuracy']:.4f} "
              f"ens+prior={res['ensemble_prior_accuracy']:.4f} "
              f"mlp={res['mlp_accuracy']:.4f} "
              f"cnn={res['cnn_accuracy']:.4f} "
              f"yin={res['yin_accuracy']:.4f} (n={res['n_clips']})")
    report["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report, indent=2))

    # confusion detail for the base (mixed) set
    labels = base["_labels"]
    classes = sorted(set(labels))
    y_true = np.asarray([classes.index(l) for l in labels])
    rm = t.predictor.reverse_map
    preds = base["_result"]["probs"].argmax(axis=1)
    pred_names = [rm[int(i)] for i in preds]
    y_pred = np.asarray([classes.index(n) if n in classes else -1
                         for n in pred_names])
    print(classification_report(y_true, np.where(y_pred < 0, 0, y_pred),
                                classes))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
