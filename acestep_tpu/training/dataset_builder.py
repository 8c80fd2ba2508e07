"""Dataset builder scan + label stages (reference dataset_builder_modules/).

Stages (SURVEY.md §2.2 dataset builder; round-1 shipped only
preprocess/serialize in training/data.py):

  1. scan    — walk a directory for audio files with caption/lyrics sidecars
               and optional metadata.csv (scan.py:14-100 semantics: .txt sidecar
               is the caption, .lyrics/.lrc is the lyrics, csv columns override);
  2. label   — auto-caption each sample with the LM: audio -> VAE latents ->
               5 Hz codes (codec tokenizer) -> understand_audio_from_codes ->
               metadata fields (label_single.py:13-100);
  3. preprocess/serialize — training/data.py (existing).

Audio input here is WAV (the in-image decoder); flac written by our AudioSaver
round-trips through utils.flac.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

SUPPORTED_AUDIO_FORMATS = (".wav", ".flac")


@dataclasses.dataclass
class AudioSample:
    audio_path: str
    filename: str
    duration_s: float = 0.0
    caption: str = ""
    lyrics: str = ""
    is_instrumental: bool = False
    bpm: Optional[int] = None
    keyscale: str = ""
    timesignature: str = ""
    language: str = ""
    genres: str = ""
    labeled: bool = False


def _load_sidecar(audio_path: str, exts) -> str:
    root = os.path.splitext(audio_path)[0]
    for ext in exts:
        p = root + ext
        if os.path.exists(p):
            try:
                with open(p, encoding="utf-8") as f:
                    return f.read().strip()
            except OSError:
                pass
    return ""


def _load_csv_metadata(directory: str) -> Dict[str, Dict[str, str]]:
    """metadata.csv keyed by filename; columns caption/lyrics/bpm/keyscale/..."""
    path = os.path.join(directory, "metadata.csv")
    table: Dict[str, Dict[str, str]] = {}
    if not os.path.exists(path):
        return table
    try:
        with open(path, newline="", encoding="utf-8") as f:
            for row in csv.DictReader(f):
                name = row.get("filename") or row.get("file") or ""
                if name:
                    table[name] = {k: (v or "") for k, v in row.items()}
    except (OSError, csv.Error):
        pass
    return table


def _audio_duration(path: str) -> Tuple[float, int]:
    from acestep_tpu.utils.audio import read_wav

    if path.lower().endswith(".flac"):
        from acestep_tpu.utils.flac import decode_flac

        with open(path, "rb") as f:
            audio, sr = decode_flac(f.read())
    else:
        audio, sr = read_wav(path)
    return audio.shape[0] / sr, sr


def scan_directory(directory: str) -> List[AudioSample]:
    """Stage 1: collect audio files + sidecars + csv metadata."""
    if not os.path.isdir(directory):
        raise FileNotFoundError(directory)
    files = []
    for root, _, names in os.walk(directory):
        for name in sorted(names):
            if os.path.splitext(name)[1].lower() in SUPPORTED_AUDIO_FORMATS:
                files.append(os.path.join(root, name))
    files.sort()
    csv_meta = _load_csv_metadata(directory)

    samples = []
    for path in files:
        try:
            duration, _sr = _audio_duration(path)
        except (OSError, ValueError, AssertionError):
            continue
        name = os.path.basename(path)
        caption = _load_sidecar(path, (".txt", ".caption"))
        lyrics = _load_sidecar(path, (".lyrics", ".lrc"))
        s = AudioSample(
            audio_path=path, filename=name, duration_s=duration,
            caption=caption, lyrics=lyrics,
            is_instrumental=not bool(lyrics),
        )
        row = csv_meta.get(name, {})
        if row.get("caption"):
            s.caption = row["caption"]
        if row.get("lyrics"):
            s.lyrics = row["lyrics"]
            s.is_instrumental = False
        if row.get("bpm"):
            try:
                s.bpm = int(float(row["bpm"]))
            except ValueError:
                pass
        for k in ("keyscale", "timesignature", "language", "genres"):
            if row.get(k):
                setattr(s, k, row[k])
        samples.append(s)
    return samples


def audio_to_codes(engine, codec_params, audio: np.ndarray) -> str:
    """audio [L, C] -> 5 Hz audio-code string, via VAE encode + codec tokenize
    (the reference's get_audio_codes / convert_src_audio_to_codes,
    handler.py:1686-1741)."""
    import jax.numpy as jnp

    from acestep_tpu.lm_pipeline import indices_to_codes
    from acestep_tpu.models import codec as codec_mod
    from acestep_tpu.models import vae

    hop = engine.vae_cfg.hop_length
    t_frames = max(1, audio.shape[0] // hop)
    lat = vae.tiled_encode(
        engine.vae_params, engine.vae_cfg,
        jnp.asarray(audio[None, : t_frames * hop, :], jnp.float32),
        chunk_frames=128, overlap_frames=32,
    )
    idx = codec_mod.tokenize(codec_params, lat)
    return indices_to_codes(np.asarray(idx[0]).tolist())


def label_sample(
    sample: AudioSample,
    engine,
    lm,
    codec_params,
    *,
    skip_metas: bool = False,
    format_lyrics: bool = False,
) -> AudioSample:
    """Stage 2: auto-caption one sample with the LM understanding flow.

    Fields already present (sidecars / csv) win over LM output
    (label_single.py: has_csv_bpm / has_preloaded_lyrics guards)."""
    if sample.labeled:
        return sample
    from acestep_tpu.utils.audio import read_wav

    if sample.audio_path.lower().endswith(".flac"):
        from acestep_tpu.utils.flac import decode_flac

        with open(sample.audio_path, "rb") as f:
            audio, _sr = decode_flac(f.read())
    else:
        audio, _sr = read_wav(sample.audio_path)

    codes = audio_to_codes(engine, codec_params, audio)
    understood = lm.understand_audio_from_codes(codes)

    if not skip_metas:
        if sample.bpm is None and isinstance(understood.get("bpm"), int):
            sample.bpm = understood["bpm"]
        for k in ("keyscale", "timesignature", "language", "genres"):
            if not getattr(sample, k) and understood.get(k):
                setattr(sample, k, str(understood[k]))
    if not sample.caption and understood.get("caption"):
        sample.caption = str(understood["caption"])
    if format_lyrics and sample.lyrics:
        formatted = lm.format_sample_from_input(sample.lyrics)
        if formatted.get("caption") and not sample.caption:
            sample.caption = str(formatted["caption"])
    sample.labeled = True
    return sample


def label_all(
    samples: List[AudioSample], engine, lm, codec_params,
    progress_callback=None, **kw,
) -> List[AudioSample]:
    out = []
    for i, s in enumerate(samples):
        if progress_callback:
            progress_callback(f"labeling {i + 1}/{len(samples)}: {s.filename}")
        try:
            out.append(label_sample(s, engine, lm, codec_params, **kw))
        except Exception as e:  # noqa: BLE001 — skip unreadable samples
            if progress_callback:
                progress_callback(f"failed {s.filename}: {e}")
            out.append(s)
    return out
