"""gat_tpu — TPU-native guitar audio transcription framework.

A ground-up JAX/XLA rebuild of the capabilities of
gkotti4/guitar-audio-transcriber-ai: raw waveform → noise gating → onset
slicing → MFCC + mel-spectrogram front-ends → MLP + CNN ensemble →
Scientific Pitch Notation labels, with a batched YIN DSP baseline — all as
traced, batched device graphs (see SURVEY.md for the behavioral spec).
"""

__version__ = "1.0.0"

from .config import (  # noqa: F401
    CONFIG_VERSION, TARGET_SR, CLIP_DURATION,
    MFCC_CONFIG, MELSPEC_CONFIG, MLP_CONFIG, CNN_CONFIG, SLICER_CONFIG,
    PARALLEL_CONFIG,
    MFCCConfig, MelSpecConfig, MLPConfig, CNNConfig, AudioSlicerConfig,
)

# Lazy top-level API: `from gat_tpu import Transcriber` etc. without
# paying the jax/flax import cost for config-only users.
_LAZY = {
    "Transcriber": ".infer",
    "NotePredictor": ".infer",
    "FeatureBuilder": ".features",
    "AudioSlicer": ".segment.slicing",
    "AudioDatasetLoader": ".data.loader",
    "TrainingManager": ".train",
    "Trainer": ".train",
    "LiveTranscriber": ".stream",
    "ScanStreamer": ".stream",
    "MLP": ".models",
    "CNN": ".models",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module = importlib.import_module(_LAZY[name], __name__)
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
