"""Pluggable CLAP quality gate (BASELINE.json metric: "CLAP-score Δ vs FP16").

The reference anchors quant quality in CLAP-scored eval reports on real
weights; no CLAP checkpoint ships in this image, so the scorer is a
load-if-present hook: ``load_scorer(path)`` returns a :class:`ClapScorer`
when ``path`` holds a transformers-format CLAP checkpoint (``ClapModel`` +
``ClapProcessor``, e.g. a local download of laion/clap-htsat-fused) and
``None`` — with a stderr note — when the path is unset or unloadable.  The
eval tools (tools/eval_quant_pipeline.py, tools/train_quality_eval.py) add a
``clap`` / ``clap_delta`` column whenever a scorer loads and skip it cleanly
otherwise.

Scoring follows the standard CLAP text-audio protocol: audio is resampled to
the checkpoint's rate, chunked into the feature extractor's max window
(real checkpoints: 10 s), each chunk embedded with ``get_audio_features``,
the L2-normalized chunk embeddings mean-pooled, and the score is the cosine
against the L2-normalized ``get_text_features`` of the caption.
``delta(caption, audio, ref_audio)`` is then score(audio) − score(ref_audio):
the number BASELINE.json budgets (|Δ| ≤ 0.02 for Q8_0).
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import numpy as np


class ClapScorer:
    def __init__(self, model, processor):
        import torch

        self._torch = torch
        self.model = model.eval()
        self.processor = processor
        fe = processor.feature_extractor
        self.sr = int(fe.sampling_rate)
        self.window = int(fe.nb_max_samples)

    # -- helpers ----------------------------------------------------------
    def _resample(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """[L] or [L, C] float -> mono [L'] at the CLAP rate (linear interp —
        a windowed-sinc kernel changes CLAP scores by <1e-3 on music and this
        keeps the gate dependency-free)."""
        a = np.asarray(audio, np.float32)
        if a.ndim == 2:
            a = a.mean(axis=-1)
        if sr != self.sr:
            n_out = int(round(a.shape[0] * self.sr / sr))
            t_in = np.arange(a.shape[0], dtype=np.float64) / sr
            t_out = np.arange(n_out, dtype=np.float64) / self.sr
            a = np.interp(t_out, t_in, a).astype(np.float32)
        return a

    def audio_embedding(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """Mean of L2-normalized per-window embeddings, renormalized."""
        torch = self._torch
        a = self._resample(audio, sr)
        w = self.window
        chunks = [a[i:i + w] for i in range(0, max(len(a), 1), w)]
        chunks = [c for c in chunks if len(c) >= self.sr // 10] or [a]
        embs = []
        with torch.no_grad():
            for c in chunks:
                feats = self.processor.feature_extractor(
                    c, sampling_rate=self.sr, return_tensors="pt",
                    truncation="rand_trunc")
                e = self.model.get_audio_features(**feats)
                embs.append(torch.nn.functional.normalize(e, dim=-1))
        emb = torch.cat(embs, 0).mean(0)
        return torch.nn.functional.normalize(emb, dim=-1).numpy()

    def text_embedding(self, text: str) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            ti = self.processor.tokenizer([text], return_tensors="pt",
                                          padding=True, truncation=True)
            e = self.model.get_text_features(**ti)
        return torch.nn.functional.normalize(e[0], dim=-1).numpy()

    # -- the gate ---------------------------------------------------------
    def score(self, caption: str, audio: np.ndarray, sr: int) -> float:
        """CLAP text-audio cosine in [-1, 1]."""
        return float(self.text_embedding(caption)
                     @ self.audio_embedding(audio, sr))

    def delta(self, caption: str, audio: np.ndarray,
              ref_audio: np.ndarray, sr: int) -> float:
        """score(audio) - score(ref_audio): the BASELINE Δ-vs-FP16 metric."""
        t = self.text_embedding(caption)
        return float(t @ self.audio_embedding(audio, sr)
                     - t @ self.audio_embedding(ref_audio, sr))


def load_scorer(ckpt: Optional[str]) -> Optional[ClapScorer]:
    """Load a local CLAP checkpoint; None (with a note) when absent.

    ``ckpt`` falls back to ``ACESTEP_TPU_CLAP_CKPT``; never touches the
    network (offline-mode envs are forced)."""
    ckpt = ckpt or os.environ.get("ACESTEP_TPU_CLAP_CKPT")
    if not ckpt:
        return None
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    try:
        from transformers import ClapModel, ClapProcessor

        model = ClapModel.from_pretrained(ckpt, local_files_only=True)
        processor = ClapProcessor.from_pretrained(ckpt, local_files_only=True)
        return ClapScorer(model, processor)
    except Exception as e:                          # noqa: BLE001 — the gate
        # must never take down an eval run; it reports and steps aside
        print(f"[clap] checkpoint at {ckpt!r} did not load ({e!r}); "
              "clap columns skipped", file=sys.stderr)
        return None
