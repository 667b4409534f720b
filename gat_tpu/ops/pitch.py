"""Pitch unit conversions and Scientific Pitch Notation naming.

Replaces librosa.hz_to_midi / librosa.midi_to_note
(ref: version_1/source/dsp/yin.py:33-35). librosa's default note naming uses
the Unicode sharp '♯' while the reference's dataset labels use ASCII '#'
(SURVEY §7 hard-parts #2) — both surfaces are kept distinct here via
`unicode=`.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "hz_to_midi", "midi_to_hz", "midi_to_note", "note_to_midi",
    "STANDARD_TUNING_MIDI", "string_fret_to_note",
]

_PITCH_CLASSES_UNICODE = ["C", "C♯", "D", "D♯", "E", "F", "F♯", "G", "G♯",
                          "A", "A♯", "B"]
_PITCH_CLASSES_ASCII = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#",
                        "A", "A#", "B"]

# Standard-tuning guitar: open-string MIDI numbers, string 1 = high E
# (ref: prototyping/tools/dataset_creator_tool.py:259-266 maps string/fret
# to pitch with E2=40 on string 6).
STANDARD_TUNING_MIDI = {1: 64, 2: 59, 3: 55, 4: 50, 5: 45, 6: 40}


def hz_to_midi(hz):
    """12 * log2(hz/440) + 69. Host-side numpy — tiny scalar ops must not
    dispatch to the device (on the tunneled TPU each costs a remote
    compile). Traced code inlines the same formula with jnp."""
    return 12.0 * (np.log2(np.asarray(hz)) - np.log2(440.0)) + 69.0


def midi_to_hz(midi):
    return 440.0 * 2.0 ** ((np.asarray(midi, dtype=np.float64) - 69.0)
                           / 12.0)


def midi_to_note(midi: int, unicode: bool = True) -> str:
    """MIDI number → SPN name, e.g. 40 → 'E2'. Matches librosa.midi_to_note
    defaults (octave, no cents); unicode=False gives ASCII '#' names used as
    dataset labels."""
    midi = int(round(midi))
    table = _PITCH_CLASSES_UNICODE if unicode else _PITCH_CLASSES_ASCII
    return f"{table[midi % 12]}{midi // 12 - 1}"


def note_to_midi(name: str) -> int:
    """SPN name → MIDI number. Accepts both '#' and '♯' (and 'b'/'♭')."""
    s = name.strip()
    pc = s[0].upper()
    idx = _PITCH_CLASSES_ASCII.index(pc)
    rest = s[1:]
    while rest and rest[0] in "#♯b♭":
        idx += 1 if rest[0] in "#♯" else -1
        rest = rest[1:]
    octave = int(rest)
    # no pitch-class wrap: accidentals carry across the octave boundary
    # (librosa semantics — 'Cb4' is 59, one below C4; 'B#3' is 60)
    return (octave + 1) * 12 + idx


def string_fret_to_note(string: int, fret: int, unicode: bool = False) -> str:
    """Guitar (string, fret) → SPN label under standard tuning
    (ref dataset_creator_tool.py:259-266)."""
    return midi_to_note(STANDARD_TUNING_MIDI[string] + fret, unicode=unicode)
