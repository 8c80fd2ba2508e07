"""WAV IO and audio helpers (no external audio deps).

Mirrors the reference's 16-bit WAV writer (acestep_ggml/cpp/ace_ggml_cli.cpp:56-121)
and peak normalization (acestep/audio_utils.py:24).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def write_wav(path: str, audio: np.ndarray, sample_rate: int = 48000) -> None:
    """Write [L, C] or [C, L]-agnostic float audio (clipped to [-1, 1]) as 16-bit PCM.

    Expects [L, C] (samples-major).  Values are clipped then scaled by 32767.
    """
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[:, None]
    n_samples, n_channels = audio.shape
    pcm = np.clip(audio.astype(np.float64), -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2")
    data = pcm.tobytes()  # interleaved (samples-major)

    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate,
                            byte_rate, block_align, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a 16-bit or float32 PCM WAV -> ([L, C] float32 in [-1, 1], sample_rate)."""
    with open(path, "rb") as f:
        riff = f.read(12)
        if riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"not a WAV file: {path}")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            chunk = f.read(size + (size & 1))[:size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", chunk[:16])
            elif cid == b"data":
                data = chunk
        if fmt is None or data is None:
            raise ValueError(f"malformed WAV: {path}")
        audio_format, n_channels, sample_rate, _, _, bits = fmt
        if audio_format == 1 and bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
        elif audio_format == 3 and bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float32)
        else:
            raise ValueError(f"unsupported WAV format {audio_format}/{bits}bit")
        return x.reshape(-1, n_channels), sample_rate


def peak_normalize(audio: np.ndarray, peak: float = 0.99) -> np.ndarray:
    """Scale so max |x| == peak (only if it exceeds peak; audio_utils.py:24)."""
    m = np.abs(audio).max()
    if m > peak and m > 0:
        return audio * (peak / m)
    return audio
