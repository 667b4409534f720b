"""Static configuration for the TPU-native guitar transcriber.

Three-tier config system mirroring the reference design
(ref: version_1/source/config.py:1-118):

  1. frozen-dataclass singletons (this module) — compile-time defaults,
  2. checkpoint-embedded params — the source of truth at inference
     (checkpoints are self-describing; see gat_tpu/train/checkpoint.py),
  3. CLI flags — per-invocation overrides (see gat_tpu/cli.py).

All values match the reference's shipped defaults so that feature pipelines
are numerically comparable (ref: version_1/source/config.py:29-107).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, asdict
from pathlib import Path

CONFIG_VERSION = "1.0.0"

# ---------------------------------------------------------------------------
# Root paths
# ---------------------------------------------------------------------------
PROJECT_ROOT = Path(__file__).resolve().parent.parent
# Data (datasets/checkpoints) lives beside the package in a checkout; a
# non-editable `pip install .` does not package it — point GAT_TPU_DATA_ROOT
# at a checkout's data/ (or any dir with checkpoints/, datasets/) instead.
DATA_ROOT = Path(os.environ.get("GAT_TPU_DATA_ROOT", PROJECT_ROOT / "data"))
DATASETS_ROOT = DATA_ROOT / "datasets"
PERSONAL_DATASETS_ROOT = DATASETS_ROOT / "personal"
INFERENCE_ROOT = DATA_ROOT / "inference"
INFERENCE_CLIPS_ROOT = INFERENCE_ROOT / "sliced_clips"
INFERENCE_AUDIO_ROOT = INFERENCE_ROOT / "in_audio"
INFERENCE_OUTPUT_ROOT = INFERENCE_ROOT / "output"
CHECKPOINTS_ROOT = DATA_ROOT / "checkpoints"

# ---------------------------------------------------------------------------
# Global audio constants (ref: config.py:29-30)
# ---------------------------------------------------------------------------
TARGET_SR = 11025 * 2  # 22050 Hz — slicing/saving rate
CLIP_DURATION = 0.50   # seconds per note clip


# ---------------------------------------------------------------------------
# Config groups
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class MFCCConfig:
    """MFCC-vector front-end for the MLP (ref: config.py:37-43)."""
    N_MFCC: int = 64
    BATCH_SIZE: int = 32
    STANDARD_SCALER: bool = True
    NORMALIZE_AUDIO_VOLUME: bool = True
    ADD_PITCH_FEATURES: bool = True


@dataclass(frozen=True)
class MelSpecConfig:
    """Mel-spectrogram front-end for the CNN (ref: config.py:47-53)."""
    N_MELS: int = 64
    N_FFT: int = 2048
    HOP_LENGTH: int = 256
    BATCH_SIZE: int = 32
    NORMALIZE_AUDIO_VOLUME: bool = True
    TO_DB: bool = True


@dataclass(frozen=True)
class MLPConfig:
    """MLP model + training hyperparameters (ref: config.py:57-73).

    DEFAULT_CKPT_NAME is the round-3 retrained MLP (all3-family +
    stressor + channel augmentation): unlike the reference import it
    holds ≥0.99 on every held-out family/stressor row (README table).
    The reference-imported weights stay at mlp_v1.0.0.gtckpt.npz as the
    weight-parity artifact (never overwritten; select it with
    Transcriber(mlp_ckpt=...) for reference-identical behavior)."""
    CHECKPOINTS_DIR: Path = CHECKPOINTS_ROOT / "mlp"
    DEFAULT_CKPT_NAME: str = f"mlp_synth_v{CONFIG_VERSION}.gtckpt.npz"
    REFERENCE_CKPT_NAME: str = f"mlp_v{CONFIG_VERSION}.gtckpt.npz"

    SAVE_CHECKPOINT: bool = True

    HIDDEN_DIM: int = 128
    NUM_HIDDEN_LAYERS: int = 2
    DROPOUT: float = 0.1

    LR: float = 1e-3
    DECAY: float = 1e-4

    EPOCHS: int = 10
    MAX_CLIP_NORM: float = 1.0
    ES_WINDOW_LEN: int = 4
    ES_SLOPE_LIMIT: float = -0.00015


@dataclass(frozen=True)
class CNNConfig:
    """CNN model + training hyperparameters (ref: config.py:77-96)."""
    CHECKPOINTS_DIR: Path = CHECKPOINTS_ROOT / "cnn"
    DEFAULT_CKPT_NAME: str = f"cnn_v{CONFIG_VERSION}.gtckpt.npz"

    SAVE_CHECKPOINT: bool = True

    BASE_CHANNELS: int = 32
    NUM_BLOCKS: int = 3
    KERNEL_SIZE: int = 3
    HIDDEN_DIM: int = 256
    DROPOUT: float = 0.1

    LR: float = 1e-3
    DECAY: float = 1e-4

    EPOCHS: int = 3
    MAX_CLIP_NORM: float = 1.0
    ES_WINDOW_LEN: int = 4
    ES_SLOPE_LIMIT: float = -0.00015
    USE_AMP: bool = True  # on TPU: bf16 matmul path instead of CUDA AMP


@dataclass(frozen=True)
class AudioSlicerConfig:
    """Noise-gating + onset-slicing parameters (ref: config.py:100-107)."""
    MIN_IN_DB_THRESHOLD: float = -32.5  # per-sample amplitude gate
    MIN_SLICE_RMS_DB: float = -37.0     # per-slice loudness gate

    HOP_LEN: int = 512
    MIN_SEP: float = 0.3                # min onset separation (s)

    ATTACK_SKIP_SEC: float = 0.1        # skip note attack when slicing


@dataclass(frozen=True)
class ParallelConfig:
    """TPU mesh layout. The reference is single-device (SURVEY §2.4); here the
    clip batch shards over a `data` axis and a `model` axis is exposed for
    generality."""
    DATA_AXIS: str = "data"
    MODEL_AXIS: str = "model"
    # Static padding budgets (XLA needs static shapes):
    MAX_ONSETS: int = 64        # max onsets per file-level transcription
    MAX_CLIPS_PER_BATCH: int = 1024


# ---------------------------------------------------------------------------
# Singletons
# ---------------------------------------------------------------------------
MFCC_CONFIG = MFCCConfig()
MELSPEC_CONFIG = MelSpecConfig()
MLP_CONFIG = MLPConfig()
CNN_CONFIG = CNNConfig()
SLICER_CONFIG = AudioSlicerConfig()
PARALLEL_CONFIG = ParallelConfig()


def config_dict(cfg) -> dict:
    """JSON-safe asdict (Paths → str) for checkpoint embedding."""
    d = asdict(cfg)
    return {k: (str(v) if isinstance(v, Path) else v) for k, v in d.items()}
