"""Continuous batcher for song requests (the north-star serving component).

Generalizes nano-vllm's token-level continuous batching (scheduler.py:17-272) to
whole-song generation on TPU: incoming requests are grouped by their COMPILE
SHAPE key — frame bucket, condition token buckets, task, schedule — so a merged
batch reuses an already-compiled sampler graph, and mixed durations ride one
bucket via per-item attention masks (BASELINE.json configs[3]).

TPU-shaped design decisions vs the GPU reference:
  * no paged KV / preemption — diffusion jobs are short and fixed-length, so the
    scheduler works at request granularity with shape-keyed FIFO queues;
  * batch launch policy: fire when max_batch requests are waiting OR the oldest
    request exceeds max_wait_s (latency/throughput knob);
  * one worker per engine — device work is serialized anyway (the reference
    locks its engine the same way, llm_engine.py:24-32).
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import threading
import time
import uuid
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from acestep_tpu.pipeline import (
    GenerationRequest,
    GenerationResult,
    _token_bucket,
    bucket_frames,
    frames_for_duration,
)


@dataclasses.dataclass
class _Pending:
    id: str
    req: GenerationRequest
    future: Future
    arrived: float
    priority: int = 0        # higher runs first (nano-vllm preemption analog:
                             # queued lower-priority work yields; aging via
                             # AGING_S prevents starvation)


AGING_S = 5.0                # queued priority rises one level per AGING_S
MERGED_SIZES_WINDOW = 256    # rolling window for /v1/stats merge-rate (old
                             # traffic must not dominate a long-running server)
ADMIT_CACHE_TTL_S = 60.0     # re-query the HBM admission hook after this long
                             # (engine memory conditions change, e.g. LoRA load)

log = logging.getLogger(__name__)


def _merge_key(req: GenerationRequest) -> Tuple:
    """Fields that must be EQUAL for a semantically correct merge (everything
    merge_requests copies from reqs[0] that changes the computed graph or the
    guidance math).  Frame/token buckets are NOT in the key — shorter requests
    pad up to the batch's bucket and per-item masks carry validity."""
    return (
        req.task, req.shift,
        tuple(req.timesteps) if req.timesteps else None,
        req.infer_method, req.infer_steps, req.guidance_scale, req.use_adg,
        req.cfg_interval_start, req.cfg_interval_end,
        req.audio_cover_strength, req.repaint_start_s, req.repaint_end_s,
        req.track_name,
        tuple(req.complete_track_classes) if req.complete_track_classes else None,
    )


def _req_frames(req: GenerationRequest) -> int:
    return bucket_frames(frames_for_duration(req.duration_s))


def _shape_key(req: GenerationRequest) -> Tuple:
    """Exact compile-shape key (merge key + frame/token buckets) — requests
    sharing it merge with zero padding overhead."""
    style_b = _token_bucket(req.style_token_ids.shape[1]) if req.style_token_ids is not None else 0
    lyric_b = _token_bucket(req.lyric_token_ids.shape[1]) if req.lyric_token_ids is not None else 0
    timbre = req.refer_latents.shape[1] if req.refer_latents is not None else 0
    return _merge_key(req) + (_req_frames(req), style_b, lyric_b, timbre)


def _pad_ids(ids: np.ndarray, bucket: int) -> Tuple[np.ndarray, np.ndarray]:
    mask = np.ones_like(ids)
    pad = bucket - ids.shape[1]
    if pad > 0:
        ids = np.pad(ids, ((0, 0), (0, pad)))
        mask = np.pad(mask, ((0, 0), (0, pad)))
    return ids, mask


def merge_requests(reqs: List[GenerationRequest]) -> GenerationRequest:
    """Merge semantically compatible single requests into one batched request.

    Mixed frame buckets are allowed: shorter items pad up to the batch's max
    bucket (the engine's per-item duration masks carry validity — configs[3]
    cross-bucket continuous batching)."""
    assert reqs
    key = _merge_key(reqs[0])
    assert all(_merge_key(r) == key for r in reqs), "incompatible merge"
    out = dataclasses.replace(reqs[0])
    out.batch_size = sum(r.batch_size for r in reqs)
    out.durations_s = [
        d for r in reqs
        for d in (r.durations_s if r.durations_s else [r.duration_s] * r.batch_size)
    ]
    out.duration_s = max(out.durations_s)
    out.seeds = [
        s for r in reqs
        for s in (list(r.seeds) if r.seeds else list(range(r.batch_size)))
    ]

    def cat(field, bucket_fn=None):
        vals = [getattr(r, field) for r in reqs]
        if all(v is None for v in vals):
            return None, None
        arrs, masks = [], []
        width = max(v.shape[1] for v in vals if v is not None)
        if bucket_fn:
            width = bucket_fn(width)
        for r, v in zip(reqs, vals):
            b = r.batch_size
            if v is None:
                arrs.append(np.zeros((b, width), np.int32))
                masks.append(np.zeros((b, width), np.int32))
            else:
                ids, m = _pad_ids(np.asarray(v, np.int32), width)
                arrs.append(np.broadcast_to(ids, (b, width)) if ids.shape[0] == 1 else ids)
                masks.append(np.broadcast_to(m, (b, width)) if m.shape[0] == 1 else m)
        return np.concatenate(arrs, 0), np.concatenate(masks, 0)

    out.style_token_ids, out.style_mask = cat("style_token_ids", _token_bucket)
    out.lyric_token_ids, out.lyric_mask = cat("lyric_token_ids", _token_bucket)
    if any(r.refer_latents is not None for r in reqs):
        n_refer = max(r.refer_latents.shape[1] for r in reqs if r.refer_latents is not None)
        lat_dim = next(r.refer_latents for r in reqs if r.refer_latents is not None).shape[-1]
        lr = max(r.refer_latents.shape[2] for r in reqs if r.refer_latents is not None)
        blocks, cmasks = [], []
        for r in reqs:
            b = r.batch_size
            if r.refer_latents is None:
                blocks.append(np.zeros((b, n_refer, lr, lat_dim), np.float32))
                cmasks.append(np.zeros((b, n_refer), np.int32))
            else:
                v = np.asarray(r.refer_latents, np.float32)
                v = np.pad(v, ((0, 0), (0, n_refer - v.shape[1]), (0, lr - v.shape[2]), (0, 0)))
                blocks.append(np.broadcast_to(v, (b,) + v.shape[1:]) if v.shape[0] == 1 else v)
                cm = np.zeros((b, n_refer), np.int32)
                cm[:, : r.refer_latents.shape[1]] = 1
                cmasks.append(cm)
        out.refer_latents = np.concatenate(blocks, 0)
        out.refer_mask = np.concatenate(cmasks, 0)
    if any(r.src_latents is not None for r in reqs):
        t_frames = max(r.src_latents.shape[1] for r in reqs if r.src_latents is not None)
        blocks = []
        for r in reqs:
            b = r.batch_size
            if r.src_latents is None:
                blocks.append(np.zeros((b, t_frames, 64), np.float32))
            else:
                v = np.asarray(r.src_latents, np.float32)
                v = np.pad(v, ((0, 0), (0, t_frames - v.shape[1]), (0, 0)))
                blocks.append(np.broadcast_to(v, (b,) + v.shape[1:]) if v.shape[0] == 1 else v)
        out.src_latents = np.concatenate(blocks, 0)
    return out


def split_result(result: GenerationResult, sizes: List[int]) -> List[GenerationResult]:
    if len(sizes) == 1:
        # single request: pass through untouched (keeps segmented PCM from the
        # overlapped decode path segmented — no lazy concat for long songs)
        return [result]
    outs = []
    i = 0
    for n in sizes:
        sl = slice(i, i + n)
        # slice the int16 payload when present (views, no float expansion)
        audio_kw = (
            {"audio_i16": result.audio_i16[sl], "audio_scale": result.audio_scale}
            if result.audio_i16 is not None
            else {"audio": result.audio[sl]}
        )
        outs.append(GenerationResult(
            latents=result.latents[sl],
            sample_rate=result.sample_rate,
            time_costs=result.time_costs,
            seeds=result.seeds[sl],
            audio_lengths=result.audio_lengths[sl] if result.audio_lengths else None,
            **audio_kw,
        ))
        i += n
    return outs


class ContinuousBatcher:
    def __init__(
        self,
        run_fn: Callable[[GenerationRequest], GenerationResult],
        max_batch: int = 8,
        max_wait_s: float = 0.25,
        pad_ratio: float = 2.5,
        max_batch_for: Optional[Callable[[int], int]] = None,
    ):
        # pad_ratio: max frame-bucket spread inside one merged batch — shorter
        # requests pad up to the batch bucket (wasting <= (ratio-1)/ratio of
        # their lanes) in exchange for fewer dispatches; 1.0 = exact-bucket
        # merging only.
        # max_batch_for(frames) -> int: HBM-admission cap per frame bucket
        # (AceStepEngine.max_batch_for_frames) — a merged batch never grows
        # past what the memory plan admits at its max bucket, so the engine's
        # batch clamp (which would truncate a multi-item request) never fires
        self.run_fn = run_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.pad_ratio = max(1.0, pad_ratio)
        self.max_batch_for = max_batch_for
        self._admit_cache: Dict[int, Tuple[int, float]] = {}  # frames -> (cap, stamp)
        self._queues: Dict[Tuple, List[_Pending]] = {}
        self._lock = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self.stats = {
            "batches": 0, "requests": 0,
            "merged_sizes": collections.deque(maxlen=MERGED_SIZES_WINDOW),
            "padded_items": 0,
        }

    def stats_summary(self) -> Dict[str, Any]:
        """Merge-rate stats for /v1/stats (nano-vllm scheduler exposes its
        batch occupancy the same way)."""
        sizes = list(self.stats["merged_sizes"])  # rolling window, not history
        return {
            "requests": self.stats["requests"],
            "batches": self.stats["batches"],
            "avg_merged_batch": round(sum(sizes) / len(sizes), 2) if sizes else 0.0,
            "max_merged_batch": max(sizes) if sizes else 0,
            "merge_window": MERGED_SIZES_WINDOW,
            "padded_items": self.stats["padded_items"],
            "queued": sum(len(q) for q in self._queues.values()),
        }

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        with self._lock:
            self._stop = True
            self._lock.notify_all()
        self._thread.join(timeout=5)

    def submit(self, req: GenerationRequest, priority: int = 0) -> Future:
        fut: Future = Future()
        p = _Pending(uuid.uuid4().hex, req, fut, time.time(), priority)
        with self._lock:
            self._queues.setdefault(_merge_key(req), []).append(p)
            self.stats["requests"] += 1
            self._lock.notify_all()
        return fut

    @staticmethod
    def _effective_priority(p: _Pending, now: float) -> float:
        return p.priority + (now - p.arrived) / AGING_S

    def _allowed_batch(self, frames: int) -> int:
        """Admission cap at a frame bucket (memoized with a TTL so caps track
        changing engine memory conditions, e.g. LoRA weights loaded later)."""
        if self.max_batch_for is None:
            return self.max_batch
        now = time.time()
        cached = self._admit_cache.get(frames)
        if cached is None or now - cached[1] > ADMIT_CACHE_TTL_S:
            try:
                cap = int(self.max_batch_for(frames))
            except Exception:
                # fail CLOSED: the hook exists to enforce HBM admission — if it
                # breaks, serialize (cap=1) rather than silently disabling it
                log.warning("max_batch_for(%d) raised; failing closed to cap=1",
                            frames, exc_info=True)
                cap = 1
            self._admit_cache[frames] = (max(1, min(self.max_batch, cap)), now)
        return self._admit_cache[frames][0]

    def _pick_batch(self) -> Optional[List[_Pending]]:
        now = time.time()
        best = None
        # highest effective priority (priority + age credit) schedules first;
        # a newly-arrived high-priority request therefore "preempts" any
        # queued lower-priority shape group
        ordered = sorted(
            (kq for kq in self._queues.items() if kq[1]),
            key=lambda kq: -max(self._effective_priority(p, now) for p in kq[1]),
        )
        for key, q in ordered:
            q.sort(key=lambda p: (-self._effective_priority(p, now), p.arrived))
            total = sum(p.req.batch_size for p in q)
            age = now - min(p.arrived for p in q)
            if total >= self.max_batch or age >= self.max_wait_s:
                # greedy pad-up window from the highest-priority anchor: an
                # item joins while the batch's frame-bucket spread stays
                # within pad_ratio (it will pad up to the batch max bucket)
                take, n = [], 0
                fmin = fmax = _req_frames(q[0].req)
                i = 0
                while i < len(q):
                    p = q[i]
                    f = _req_frames(p.req)
                    nf_min, nf_max = min(fmin, f), max(fmax, f)
                    if (n + p.req.batch_size <= self._allowed_batch(nf_max)
                            and nf_max <= nf_min * self.pad_ratio):
                        take.append(q.pop(i))
                        n += p.req.batch_size
                        fmin, fmax = nf_min, nf_max
                    else:
                        i += 1
                if not take:       # single over-size request: run alone
                    take = [q.pop(0)]
                if len(take) > 1:
                    self.stats["padded_items"] += sum(
                        1 for p in take if _req_frames(p.req) < fmax)
                return take
            if best is None or age > now - best[0].arrived:
                best = q
        return None

    def _loop(self):
        while True:
            with self._lock:
                batch = self._pick_batch()
                while batch is None and not self._stop:
                    self._lock.wait(timeout=self.max_wait_s / 2)
                    batch = self._pick_batch()
                if self._stop and batch is None:
                    return
            try:
                merged = merge_requests([p.req for p in batch])
                result = self.run_fn(merged)
                if len(batch) > 1 and result.latents.shape[0] != merged.batch_size:
                    # the engine's HBM guard clamped the merged batch: fail
                    # loudly rather than mis-splitting the surviving rows
                    # across futures (admission via max_batch_for should
                    # prevent reaching this)
                    raise RuntimeError(
                        f"engine returned {result.latents.shape[0]} items for a "
                        f"merged batch of {merged.batch_size}; configure the "
                        f"batcher's max_batch_for to respect the HBM plan")
                parts = split_result(result, [p.req.batch_size for p in batch])
                for p, r in zip(batch, parts):
                    p.future.set_result(r)
                self.stats["batches"] += 1
                self.stats["merged_sizes"].append(merged.batch_size)
            except Exception as e:  # noqa: BLE001
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)
