"""WAV IO and audio helpers (no external audio deps).

Mirrors the reference's 16-bit WAV writer (acestep_ggml/cpp/ace_ggml_cli.cpp:56-121)
and peak normalization (acestep/audio_utils.py:24).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def _pcm_segments(audio) -> list:
    """Normalize input (one [L, C] array or a list of time-contiguous
    segments) to a list of contiguous little-endian int16 [L, C] arrays.

    Float input is clipped to [-1, 1] and scaled by 32767.  int16 input is
    passed through with zero copies — the serving path hands the device's
    already-quantized PCM (possibly segmented) straight through, which matters
    in this sandbox where large fresh host allocations page-fault at ~40 MB/s.
    """
    segs = list(audio) if isinstance(audio, (list, tuple)) else [audio]
    out = []
    for a in segs:
        a = np.asarray(a)
        if a.ndim == 1:
            a = a[:, None]
        if a.dtype == np.int16:
            out.append(np.ascontiguousarray(a))
        else:
            a = np.clip(a.astype(np.float64), -1.0, 1.0)
            out.append(np.ascontiguousarray(np.round(a * 32767.0).astype("<i2")))
    return out


def _wav_header(n_bytes: int, n_channels: int, sample_rate: int) -> bytes:
    byte_rate = sample_rate * n_channels * 2
    return (
        b"RIFF" + struct.pack("<I", 36 + n_bytes) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate,
                      byte_rate, n_channels * 2, 16)
        + b"data" + struct.pack("<I", n_bytes)
    )


def write_wav(path: str, audio, sample_rate: int = 48000) -> None:
    """Write audio ([L, C] array, or a LIST of time-contiguous segments from
    the overlapped segmented decode) as 16-bit PCM — segments stream to the
    file without host reassembly."""
    segs = _pcm_segments(audio)
    n_channels = segs[0].shape[1]
    n_bytes = sum(s.nbytes for s in segs)
    # buffering=0: BufferedWriter chunk-copies large payloads through fresh
    # buffers, which page-fault at ~10 MB/s in this sandbox (measured 16 s for
    # a 600 s song vs 0.04 s raw) — write the PCM memory directly instead
    with open(path, "wb", buffering=0) as f:
        f.write(_wav_header(n_bytes, n_channels, sample_rate))
        for s in segs:
            f.write(memoryview(s).cast("B"))   # interleaved (samples-major)


def wav_bytes(audio, sample_rate: int = 48000) -> bytes:
    """16-bit WAV as in-memory bytes (same semantics as write_wav; accepts a
    segment list) — the serving path base64-encodes the payload, so a
    temp-file round trip is pure overhead."""
    segs = _pcm_segments(audio)
    n_bytes = sum(s.nbytes for s in segs)
    parts = [_wav_header(n_bytes, segs[0].shape[1], sample_rate)]
    parts.extend(s.tobytes() for s in segs)
    return b"".join(parts)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a 16-bit or float32 PCM WAV -> ([L, C] float32 in [-1, 1], sample_rate)."""
    with open(path, "rb") as f:
        return _read_wav_stream(f, path)


def read_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """read_wav over in-memory bytes (serving audio-upload payloads)."""
    import io

    return _read_wav_stream(io.BytesIO(data), "<bytes>")


def _read_wav_stream(f, path: str) -> Tuple[np.ndarray, int]:
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


# ---------------------------------------------------------------------------
# AudioSaver: multi-format save with graceful fallback + deterministic UUIDs
# (acestep/audio_utils.py:66-303 AudioSaver, :304-382 content hashing)
# ---------------------------------------------------------------------------

import hashlib as _hashlib
import os as _os
import uuid as _uuid
import warnings as _warnings


def content_hash(audio: np.ndarray, sample_rate: int) -> str:
    """Stable content hash of the PCM payload (audio_utils.py:304-340)."""
    pcm = np.round(np.clip(np.asarray(audio, np.float64), -1.0, 1.0) * 32767.0)
    h = _hashlib.sha256()
    h.update(str(int(sample_rate)).encode())
    h.update(pcm.astype("<i2").tobytes())
    return h.hexdigest()


def deterministic_uuid(audio: np.ndarray, sample_rate: int, *extra: str) -> str:
    """Deterministic UUID5 from the audio content (+ optional request fields) —
    identical generations get identical ids (audio_utils.py:330-382)."""
    name = content_hash(audio, sample_rate) + "|" + "|".join(extra)
    return str(_uuid.uuid5(_uuid.NAMESPACE_URL, name))


class AudioSaver:
    """Save audio as wav / flac / mp3 with the reference's fallback ladder.

    * wav  — 16-bit PCM (always available)
    * flac — dependency-free verbatim-FLAC encoder (utils/flac.py)
    * mp3  — LAME via the system libmp3lame (utils/mp3.py ctypes binding,
      320 kbps joint stereo — the reference encodes through the same
      library); when the shared library is absent the saver warns and
      falls back to wav (the reference degrades the same way when its
      torchaudio backend is missing, audio_utils.py:200-260)
    """

    FORMATS = ("wav", "flac", "mp3")

    def __init__(self, default_format: str = "wav"):
        self.default_format = default_format

    def save(
        self, audio: np.ndarray, path: str, sample_rate: int = 48000,
        audio_format: str = None,
    ) -> str:
        """Write audio; returns the actual path written (extension may change
        on fallback)."""
        fmt = (audio_format or self.default_format).lower().lstrip(".")
        root, ext = _os.path.splitext(path)
        if fmt == "flac":
            from acestep_tpu.utils import flac as _flac

            if isinstance(audio, (list, tuple)):   # segmented decode output
                audio = np.concatenate([np.asarray(a) for a in audio], axis=0)
            out = root + ".flac"
            _flac.write_flac(out, audio, sample_rate)
            return out
        if fmt == "mp3":
            from acestep_tpu.utils import mp3 as _mp3

            if _mp3.encoder_available():
                if isinstance(audio, (list, tuple)):
                    audio = np.concatenate(
                        [np.asarray(a) for a in audio], axis=0)
                out = root + ".mp3"
                _mp3.write_mp3(out, np.asarray(audio), sample_rate)
                return out
            _warnings.warn(
                "libmp3lame not available on this host; saving WAV instead",
                stacklevel=2,
            )
            fmt = "wav"
        out = root + ".wav"
        write_wav(out, audio, sample_rate)
        return out

    def save_batch(
        self, audios, sample_rate: int = 48000, out_dir: str = ".",
        audio_format: str = None, prefix: str = "", request_key: str = "",
    ):
        """Save a batch with deterministic content-derived filenames; returns
        the list of written paths."""
        paths = []
        for item in audios:
            uid = deterministic_uuid(item, sample_rate, request_key)
            path = _os.path.join(out_dir, f"{prefix}{uid}.wav")
            paths.append(self.save(item, path, sample_rate, audio_format))
        return paths
