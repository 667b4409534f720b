"""End-to-end wall-clock of the shipped training recipe.

Times synth -> load -> features -> epochs for BOTH shipped models
(the canonical `tools/train_synthetic.py --model all --noise
--variants 48 --family all3 --stressor_prob 0.5 --channel_prob 0.25`
recipe: all3 families, mixed stressors + channel augmentation,
reproduced inline below), using a temp
dataset dir and save=False so shipped checkpoints are never touched.
Measured numbers live in docs/PERF.md ("End-to-end training
wall-clock"). Reference counterpart: the trainer loop at
prototyping/source/training/mlp_trainer.py:287-383 (no wall-clock
record exists there to compare against).

Run on the TPU: python tools/train_wall.py
"""
import sys
import time
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from gat_tpu.data.synth import synthesize_note_dataset
from gat_tpu.train import TrainingManager


def main():
    tmp = Path(tempfile.mkdtemp(prefix="train_wall_"))
    ds = tmp / "all3_shipped"

    t0 = time.perf_counter()
    synthesize_note_dataset(ds, variants_per_class=48, seed=42,
                            noise_snr_db=(8.0, 40.0), family="all3",
                            stressor="mix", stressor_prob=0.5,
                            channel="mix", channel_prob=0.25)
    t_synth = time.perf_counter() - t0
    print(f"WALL synth: {t_synth:.1f}s", flush=True)

    mgr = TrainingManager(target_sr=11025)

    t1 = time.perf_counter()
    tr = mgr.train_cnn(dataset=ds, epochs=40, seed=42, save=False)
    t_cnn = time.perf_counter() - t1
    acc, _ = tr.evaluate(report=False)
    print(f"WALL cnn: {t_cnn:.1f}s val_acc {acc:.4f}", flush=True)

    t2 = time.perf_counter()
    tr = mgr.train_mlp(dataset=ds, epochs=20, seed=42, save=False)
    t_mlp = time.perf_counter() - t2
    acc, _ = tr.evaluate(report=False)
    print(f"WALL mlp: {t_mlp:.1f}s val_acc {acc:.4f}", flush=True)

    print(f"WALL total: {t_synth + t_cnn + t_mlp:.1f}s", flush=True)


if __name__ == "__main__":
    main()
