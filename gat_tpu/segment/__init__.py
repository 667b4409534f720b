from .slicing import AudioSlicer, segment_waveform, slice_at_onsets  # noqa: F401
from .gating import gate_waveform, sample_db_gate, rms_gate  # noqa: F401
