#!/usr/bin/env python
"""Note-accuracy evaluation harness (BASELINE.md metric trio: throughput,
latency, note accuracy).

Synthesizes a held-out evaluation set (a different seed from training),
runs the shipped ensemble AND each model alone AND the YIN DSP baseline
over it, and reports per-system accuracy + the confusion summary the
reference prints after training (ref mlp_trainer.py:225-270).

Usage: python tools/evaluate.py [--variants 8] [--seed 777]
       [--platform cpu|tpu]
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=int, default=8)
    ap.add_argument("--seed", type=int, default=777)  # != training seed
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", type=Path, default=None,
                    help="optional JSON report path")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from gat_tpu.data.synth import synthesize_note_dataset, \
        DEFAULT_CLASS_NAMES
    from gat_tpu.data.loader import AudioDatasetLoader
    from gat_tpu.infer import Transcriber
    from gat_tpu.ops.yin import yin_pitch, estimate_note
    from gat_tpu.train.metrics import classification_report

    import tempfile
    tmp = Path(tempfile.mkdtemp())
    t0 = time.time()
    synthesize_note_dataset(tmp / "eval", variants_per_class=args.variants,
                            seed=args.seed, verbose=False)
    t = Transcriber()
    loader = AudioDatasetLoader([tmp / "eval"], target_sr=t.ckpt_sr,
                                duration=t.clip_length)
    wavs, _, labels, _ = loader.load_audio_dataset(pad_to_max=True)
    clips = jnp.asarray(np.stack(wavs))
    classes = sorted(set(labels))
    y_true = np.asarray([classes.index(l) for l in labels])

    result = t.transcribe_clips(clips)
    rm = t.predictor.reverse_map
    name_to_idx = {v: k for k, v in rm.items()}
    y_map = np.asarray([name_to_idx[l] for l in labels])

    probs = result["probs"]
    mlp_p = result["per_model_probs"]["mlp"]
    cnn_p = result["per_model_probs"]["cnn"]

    def acc(p):
        return float((p.argmax(axis=1) == y_map).mean()) if p is not None \
            else None

    yin_hz = np.asarray(yin_pitch(clips, t.ckpt_sr))
    yin_names = [estimate_note(h, unicode=False)[1] for h in yin_hz]
    yin_acc = float(np.mean([a == b for a, b in zip(yin_names, labels)]))

    report = {
        "n_clips": int(len(labels)),
        "num_classes": len(classes),
        "ensemble_accuracy": acc(probs),
        "mlp_accuracy": acc(mlp_p),
        "cnn_accuracy": acc(cnn_p),
        "yin_accuracy": yin_acc,
        "eval_seed": args.seed,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(report, indent=2))
    preds = probs.argmax(axis=1)
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
