"""End-to-end generation pipeline (native TPU analog of the reference's
ace_generate_audio_style_lyric_timbre path + handler batch prep).

Flow (SURVEY.md §3.3):
  style tokens -> Qwen text encoder -> text_projector          \
  lyric tokens -> Qwen embeddings -> DiT lyric encoder          > pack [lyric|timbre|style]
  refer latents -> DiT timbre encoder (1 token per clip)       /
  context_latents = concat(src_latents, chunk_mask)  (silence src for text2music)
  8-step flow-matching Euler loop (jitted scan)
  tiled VAE decode -> waveform

Sequence lengths are bucketed (latent frames rounded up to FRAME_BUCKET) so jit
caches stay small; validity is carried by attention masks and trailing frames are
sliced off before VAE decode.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu import sampler
from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
from acestep_tpu.models import dit, qwen, vae

FRAME_BUCKET = 256          # latent frames (~10.24 s at 25 Hz)
LATENT_RATE = 25.0          # Hz (48000 / 1920)
MAX_DURATION_S = 600.0      # reference clamp (constants.py:60-61)
MIN_DURATION_S = 10.0


def frames_for_duration(seconds: float) -> int:
    seconds = min(max(seconds, MIN_DURATION_S), MAX_DURATION_S)
    return int(round(seconds * LATENT_RATE))


def bucket_frames(frames: int) -> int:
    return int(math.ceil(frames / FRAME_BUCKET) * FRAME_BUCKET)


# ---------------------------------------------------------------------------
# condition packing ([lyric | timbre | style], valid-tokens-first per row;
# acestep_ggml.cpp:1744-1801 stable partition)
# ---------------------------------------------------------------------------

def pack_sequences(
    parts: Sequence[Tuple[jax.Array, jax.Array]],
) -> Tuple[jax.Array, jax.Array]:
    """Concatenate (hidden [B, L_i, H], mask [B, L_i]) parts along L, then
    stable-partition each batch row so valid tokens come first."""
    hidden = jnp.concatenate([h for h, _ in parts], axis=1)
    mask = jnp.concatenate([m for _, m in parts], axis=1)
    order = jnp.argsort(~mask.astype(bool), axis=1, stable=True)   # valid first
    packed_h = jnp.take_along_axis(hidden, order[:, :, None], axis=1)
    packed_m = jnp.take_along_axis(mask, order, axis=1)
    return packed_h, packed_m


# one jitted graph for the whole condition build (style + lyric + timbre):
# running these encoders eagerly would cost hundreds of per-op dispatches
TOKEN_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


def _token_bucket(n: int) -> int:
    for b in TOKEN_BUCKETS:
        if n <= b:
            return b
    return TOKEN_BUCKETS[-1]


def _pad_tokens(ids: np.ndarray, mask: Optional[np.ndarray]):
    ids = np.asarray(ids, np.int32)
    if mask is None:
        mask = np.ones_like(ids)
    b = _token_bucket(ids.shape[1])
    pad = b - ids.shape[1]
    if pad:
        ids = np.pad(ids, ((0, 0), (0, pad)))
        mask = np.pad(mask, ((0, 0), (0, pad)))
    return jnp.asarray(ids[:, :b]), jnp.asarray(np.asarray(mask, np.int32)[:, :b])


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("dit_cfg", "text_cfg"))
def encode_condition(
    dit_params, text_params, dit_cfg, text_cfg,
    style_ids, style_mask, lyric_ids, lyric_mask,
    refer_latents, refer_frame_mask, refer_clip_mask,
):
    """Full condition build in ONE compiled graph -> (packed_hidden, packed_mask)."""
    parts = []
    if lyric_ids is not None:
        emb = qwen.embeddings_only(text_params, lyric_ids)
        lyr = dit.lyric_encoder(dit_params, dit_cfg, emb, lyric_mask)
        parts.append((lyr, lyric_mask))
    if refer_latents is not None:
        b, n, lr, c = refer_latents.shape
        flat = refer_latents.reshape(b * n, lr, c)
        fm = refer_frame_mask.reshape(b * n, lr) if refer_frame_mask is not None else None
        toks = dit.timbre_encoder(dit_params, dit_cfg, flat, fm).reshape(b, n, -1)
        parts.append((toks, refer_clip_mask))
    if style_ids is not None:
        hs = qwen.forward(text_params, text_cfg, style_ids, style_mask)
        st = dit.text_projector(dit_params, hs)
        parts.append((st, style_mask))
    if not parts:
        raise ValueError("empty condition: need style, lyric, or timbre input")
    return pack_sequences(parts)


# ---------------------------------------------------------------------------
# request/result dataclasses (analog of inference.py GenerationParams/Result)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GenerationRequest:
    """One batch of generation work, pre-tokenized (the native engine takes token
    ids like the reference C++ CLI's token files; tokenization lives upstream)."""

    duration_s: float = 30.0
    style_token_ids: Optional[np.ndarray] = None      # [B, Ls] + mask
    style_mask: Optional[np.ndarray] = None
    lyric_token_ids: Optional[np.ndarray] = None      # [B, Ll]
    lyric_mask: Optional[np.ndarray] = None
    refer_latents: Optional[np.ndarray] = None        # [B, n_refer, Lr, 64]
    refer_mask: Optional[np.ndarray] = None           # [B, n_refer]
    # task control (constants.py TASK_TYPES; turbo serves the first three,
    # extract/lego/complete are base-model tasks — handler.py:1581-1610)
    task: str = "text2music"      # text2music | repaint | cover | extract | lego | complete
    src_latents: Optional[np.ndarray] = None          # [B, T, 64] source audio latents
    repaint_start_s: float = 0.0
    repaint_end_s: float = -1.0                       # -1 => to end
    audio_cover_strength: float = 1.0
    track_name: Optional[str] = None                  # extract / lego target track
    complete_track_classes: Optional[Sequence[str]] = None   # complete task
    # sampler control
    seeds: Optional[Sequence[int]] = None
    shift: float = 3.0
    timesteps: Optional[Sequence[float]] = None
    infer_method: str = "ode"
    batch_size: int = 1
    # base-model (non-turbo) CFG diffusion (handler.py:2549-2560 surface);
    # guidance_scale != 1.0 selects the CFG sampler with an infer_steps-long
    # shifted schedule instead of the turbo 8-step whitelist
    guidance_scale: float = 1.0
    infer_steps: int = 8
    cfg_interval_start: float = 0.0
    cfg_interval_end: float = 1.0
    use_adg: bool = False
    uncond_style_token_ids: Optional[np.ndarray] = None   # negative-prompt tokens
    uncond_style_mask: Optional[np.ndarray] = None
    # mixed-duration batching (BASELINE.json configs[3]): per-item durations
    # sharing one frame bucket; unset -> duration_s for every item
    durations_s: Optional[Sequence[float]] = None


class GenerationResult:
    """Generation output.  Audio is carried as 16-bit PCM (``audio_i16`` at
    ``audio_scale``, the WAV output scale) and expanded to float32 LAZILY via
    the ``.audio`` property: the host-side int16→f32 conversion of a 600 s
    song costs ~19 s in this sandbox (large fresh allocations page-fault at
    ~20 MB/s), and the WAV/FLAC writers re-quantize to int16 anyway — so the
    hot serving path never touches float audio (handler.py keeps float; this
    is a TPU-host-economics redesign, not parity)."""

    def __init__(
        self,
        latents: np.ndarray,                           # [B, T, 64]
        sample_rate: int,
        time_costs: Dict[str, float],
        seeds: List[int],
        audio: Optional[np.ndarray] = None,            # [B, L, C] float32 (padded)
        audio_lengths: Optional[List[int]] = None,     # per-item valid samples
        audio_i16: Optional[np.ndarray] = None,        # [B, L, C] int16 PCM
        audio_scale: float = 32767.0,                  # f32 = i16 / audio_scale
        audio_i16_segments: Optional[List[np.ndarray]] = None,  # [[B, Lg, C]]
    ):
        self.latents = latents
        self.sample_rate = sample_rate
        self.time_costs = time_costs
        self.seeds = seeds
        self.audio_lengths = audio_lengths
        self._audio_i16 = audio_i16
        # segmented decode keeps the PCM as time-contiguous segments so the
        # hot path never pays a large host concat (~41 MB/s in this sandbox);
        # writers stream them, .audio_i16 concatenates lazily on demand
        self._segments = audio_i16_segments
        self.audio_scale = float(audio_scale)
        self._audio_f32 = None if audio is None else np.asarray(audio)

    @property
    def audio_i16(self) -> Optional[np.ndarray]:
        """[B, L, C] int16 PCM (lazily concatenated when segmented)."""
        if self._audio_i16 is None and self._segments is not None:
            self._audio_i16 = np.concatenate(self._segments, axis=1)
        return self._audio_i16

    def pcm16_segments(self) -> List[np.ndarray]:
        """Time-contiguous PCM segments [B, Lg, C] (one element when whole);
        writers consume these without reassembly."""
        if self._segments is not None:
            return self._segments
        return [self.pcm16()]

    @property
    def audio(self) -> np.ndarray:
        """Float32 audio [B, L, C] at original amplitude (computed on demand
        from the int16 payload; cached)."""
        if self._audio_f32 is None:
            if self.audio_i16 is None:
                raise AttributeError("GenerationResult has no audio payload")
            self._audio_f32 = np.multiply(
                self.audio_i16, np.float32(1.0 / self.audio_scale),
                dtype=np.float32,
            )
        return self._audio_f32

    def pcm16(self) -> np.ndarray:
        """WAV-ready int16 PCM [B, L, C] (peak-limited to 0.99 full-scale, the
        audio_utils.py:24 normalization) with no float round-trip."""
        if self.audio_i16 is not None:
            return self.audio_i16
        a = self._audio_f32
        peak = np.abs(a).max()
        if peak > 0.99:
            a = a * (0.99 / peak)
        return np.round(np.clip(a, -1.0, 1.0) * 32767.0).astype(np.int16)


def _segment_windows_env(chunk_frames: int) -> int:
    """Windows per decode segment for the overlapped segmented path
    (ACESTEP_TPU_VAE_SEGMENT_WINDOWS overrides; 0 disables).  Default targets
    ~2048 latent frames (~82 s of audio, ~16 MB int16) per segment fetch
    regardless of the plan's chunk size."""
    env = os.environ.get("ACESTEP_TPU_VAE_SEGMENT_WINDOWS")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            pass
    return max(2, 2048 // max(chunk_frames, 1))


def _host_np(x) -> np.ndarray:
    """Device array -> host numpy, multi-process safe.

    Under a mesh that spans processes (cross-host serving), outputs sharded
    over remote devices are not fully addressable and plain device_get raises;
    the accepting host must all-gather them over DCN first — the same move
    nano-vllm's rank-0 does when collecting results from TP ranks
    (model_runner.py:174-202), expressed as a jax collective."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _fence(x: jax.Array) -> None:
    """Force completion of the computation producing x (for accurate per-phase
    time_costs).

    block_until_ready is unreliable through remote-tunnel backends (returns
    before execution completes); a 1-element readback is a true fence.  Each
    fence costs one host-device roundtrip (~30 ms on the dev tunnel), so
    latency-critical callers may disable them with ACESTEP_TPU_PHASE_FENCES=0
    — phase costs then become enqueue times; the total stays exact."""
    if os.environ.get("ACESTEP_TPU_PHASE_FENCES", "1") == "0":
        return
    shards = getattr(x, "addressable_shards", None)
    if shards is not None and len(shards) > 1:
        # sharded array: a [0:1] readback only fences the shard owning element
        # 0; touch one element of EVERY addressable shard so per-phase timings
        # cover all devices
        for s in shards:
            np.asarray(jax.device_get(s.data.ravel()[0:1]))
        return
    np.asarray(jax.device_get(x.ravel()[0:1]))


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class AceStepEngine:
    """Owns params + configs + jit caches for the DiT/VAE/text-encoder stack.

    The silence latent (text2music src context) is computed once per engine and
    broadcast per request (handler.py:727-734 loads it from the checkpoint;
    the C++ runtime VAE-encodes zeros, acestep_ggml.cpp:1952-2040)."""

    def __init__(
        self,
        dit_params: Dict[str, Any],
        dit_cfg: DiTConfig,
        vae_params: Dict[str, Any],
        vae_cfg: VAEConfig,
        text_params: Optional[Dict[str, Any]] = None,
        text_cfg: Optional[QwenConfig] = None,
        silence_latent: Optional[np.ndarray] = None,   # [1, T0, 64] tile-able
        mesh=None,                                     # jax.sharding.Mesh (dp, tp)
    ):
        # stacked layer layout -> scan-over-layers (one compiled layer body);
        # fused qkv / gate-up weights on the single-device layout (the TP path
        # column-shards per-projection weights — dit.fuse_params docstring);
        # f32-precast scales make the kernels' scale converts init-time no-ops
        from acestep_tpu.ops.qlinear import precast_quant_scales

        self.dit_params = dit.stack_params(dit_params)
        if mesh is None and os.environ.get("ACESTEP_TPU_DIT_FUSE", "1") != "0":
            self.dit_params = dit.fuse_params(self.dit_params)
        self.dit_params = precast_quant_scales(self.dit_params)
        self.dit_cfg = dit_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.text_params = qwen.stack_params(text_params) if text_params else None
        self.text_cfg = text_cfg
        # multi-chip: TP-shard the DiT over the mesh, replicate text/VAE params;
        # the sampler + condition encoders run under shard_map (parallel.tp)
        self.mesh = mesh
        self._tp_sampler = None
        self._tp_cfg_sampler = None
        self._tp_condition = None
        if mesh is not None:
            from acestep_tpu.parallel import sharding as _sh
            from acestep_tpu.parallel import tp as _tp

            self.dit_params = _sh.shard_params(self.dit_params, mesh)
            if self.text_params is not None:
                self.text_params = _sh.replicate(self.text_params, mesh)
            self.vae_params = _sh.replicate(self.vae_params, mesh)
            self._tp_sampler = _tp.make_tp_sampler(dit_cfg, mesh, self.dit_params)
            self._tp_cfg_sampler = _tp.make_tp_cfg_sampler(
                dit_cfg, mesh, self.dit_params)
            if self.text_params is not None:
                self._tp_condition = _tp.make_tp_condition(
                    dit_cfg, text_cfg, mesh, self.dit_params
                )
        # params are jit arguments (closure constants would be embedded in HLO)
        self._vae_decode_raw = jax.jit(
            lambda p, lat: vae.decode(p, self.vae_cfg, lat)
        )
        self._vae_decode_jit = lambda lat: self._vae_decode_raw(self.vae_params, lat)
        self._text_forward_jit = None
        self._param_bytes = None
        if silence_latent is not None:
            self._silence = jnp.asarray(silence_latent, jnp.float32)
        else:
            self._silence = None

    def _vae_mesh(self):
        """Mesh for window-sharded VAE decode (None => single-device path).

        Decode windows are data-parallel over EVERY mesh device (dp x tp
        flattened): VAE params are replicated, so unlike the TP'd DiT there
        is no weight-shard constraint — a (dp=2, tp=4) mesh decodes 8 windows
        at once.  ``ACESTEP_TPU_VAE_SHARD=0`` forces the serial path (A/B)."""
        if self.mesh is None or int(self.mesh.devices.size) <= 1:
            return None
        if os.environ.get("ACESTEP_TPU_VAE_SHARD", "1") == "0":
            return None
        return self.mesh

    # -- conditioning -------------------------------------------------------

    def _silence_frames(self, t: int) -> jax.Array:
        """[1, t, 64] silence src latents (tiled from the cached interior value)."""
        if self._silence is None:
            self._silence = vae.silence_latents(
                self.vae_params, self.vae_cfg, n_frames=64, chunk_frames=64
            )
        s = self._silence
        if s.shape[1] >= t:
            return s[:, :t, :]
        reps = int(math.ceil(t / s.shape[1]))
        return jnp.tile(s, (1, reps, 1))[:, :t, :]

    def encode_style(self, token_ids, mask) -> jax.Array:
        """Style branch: Qwen3 encoder + text_projector -> [B, Ls, H]."""
        if self.text_params is None:
            raise ValueError("no text encoder loaded")
        if self._text_forward_jit is None:
            self._text_forward_jit = jax.jit(
                lambda p, ids, m: qwen.forward(p, self.text_cfg, ids, m)
            )
        hs = self._text_forward_jit(
            self.text_params, jnp.asarray(token_ids, jnp.int32), jnp.asarray(mask)
        )
        return dit.text_projector(self.dit_params, hs)

    def encode_lyric(self, token_ids, mask) -> jax.Array:
        """Lyric branch: raw Qwen embeddings -> DiT lyric encoder -> [B, Ll, H]."""
        emb = qwen.embeddings_only(self.text_params, jnp.asarray(token_ids, jnp.int32))
        return dit.lyric_encoder(
            self.dit_params, self.dit_cfg, emb, jnp.asarray(mask)
        )

    def encode_timbre(self, refer_latents, refer_mask=None) -> Tuple[jax.Array, jax.Array]:
        """refer_latents [B, n_refer, Lr, 64] -> (tokens [B, n_refer, H], mask)."""
        b, n_refer, lr, c = refer_latents.shape
        flat = jnp.asarray(refer_latents, jnp.float32).reshape(b * n_refer, lr, c)
        toks = dit.timbre_encoder(self.dit_params, self.dit_cfg, flat)   # [B*n, 1, H]
        toks = toks.reshape(b, n_refer, -1)
        mask = (
            jnp.asarray(refer_mask)
            if refer_mask is not None
            else jnp.ones((b, n_refer), jnp.int32)
        )
        return toks, mask

    def build_condition(self, req: GenerationRequest, b: int) -> Tuple[jax.Array, jax.Array]:
        """Pack [lyric | timbre | style] with valid-first ordering.

        Token lengths are bucketed so the single jitted condition graph
        (encode_condition) compiles once per (style_bucket, lyric_bucket,
        n_refer) combination."""
        from acestep_tpu.constants import TIMBRE_FIX_FRAMES

        style_ids = style_mask = lyric_ids = lyric_mask = None
        refer = refer_fm = refer_cm = None
        if req.lyric_token_ids is not None:
            lyric_ids, lyric_mask = _pad_tokens(req.lyric_token_ids, req.lyric_mask)
        if req.refer_latents is not None:
            r = np.asarray(req.refer_latents, np.float32)
            bb, n, lr, c = r.shape
            fm = np.ones((bb, n, lr), np.int32)
            if lr < TIMBRE_FIX_FRAMES:
                r = np.pad(r, ((0, 0), (0, 0), (0, TIMBRE_FIX_FRAMES - lr), (0, 0)))
                fm = np.pad(fm, ((0, 0), (0, 0), (0, TIMBRE_FIX_FRAMES - lr)))
            r = r[:, :, :TIMBRE_FIX_FRAMES]
            fm = fm[:, :, :TIMBRE_FIX_FRAMES]
            refer = jnp.asarray(r)
            refer_fm = jnp.asarray(fm)
            refer_cm = (
                jnp.asarray(req.refer_mask, jnp.int32)
                if req.refer_mask is not None else jnp.ones((bb, n), jnp.int32)
            )
        if req.style_token_ids is not None:
            style_ids, style_mask = _pad_tokens(req.style_token_ids, req.style_mask)
        if self._tp_condition is not None:
            return self._tp_condition(
                self.dit_params, self.text_params,
                style_ids, style_mask, lyric_ids, lyric_mask,
                refer, refer_fm, refer_cm,
            )
        return encode_condition(
            self.dit_params, self.text_params, self.dit_cfg, self.text_cfg,
            style_ids, style_mask, lyric_ids, lyric_mask,
            refer, refer_fm, refer_cm,
        )

    # -- context latents ----------------------------------------------------

    def build_context_latents(
        self, req: GenerationRequest, b: int, t: int, t_valid: int
    ) -> jax.Array:
        """context = concat(src_latents, chunk_mask) along channels
        (handler.py:2102-2208; chunk_mask 1 = regenerate here)."""
        cfg = self.dit_cfg
        audio_dim = cfg.audio_acoustic_hidden_dim
        ctx_dim = cfg.context_dim
        # src fills min(audio, ctx) channels; the rest is chunk mask
        # (acestep_ggml.cpp:1960-2040 src_dim = min(audio_dim, ctx_dim))
        src_dim = min(audio_dim, ctx_dim)
        mask_dim = ctx_dim - src_dim

        if req.task == "text2music" or req.src_latents is None:
            src = jnp.broadcast_to(self._silence_frames(t), (b, t, audio_dim))[:, :, :src_dim]
            chunk = jnp.ones((b, t, mask_dim), jnp.float32)
        else:
            src = jnp.asarray(req.src_latents, jnp.float32)
            if src.shape[1] < t:
                src = jnp.pad(src, ((0, 0), (0, t - src.shape[1]), (0, 0)))
            src = src[:, :t, :src_dim]
            # repaint always masks a span; lego may (outpaint/overdub span) —
            # handler.py:1778-1794 "can_use_repainting = repaint or lego"
            has_span = req.task == "repaint" or (
                req.task == "lego" and req.repaint_end_s > req.repaint_start_s
            )
            if has_span:
                start = int(req.repaint_start_s * LATENT_RATE)
                end = t_valid if req.repaint_end_s < 0 else int(req.repaint_end_s * LATENT_RATE)
                frames = jnp.arange(t)
                inside = (frames >= start) & (frames < min(end, t_valid))
                chunk = jnp.broadcast_to(
                    inside.astype(jnp.float32)[None, :, None], (b, t, mask_dim)
                )
                # the masked span of src is silenced (handler.py:2190-2199:
                # src_latent[start:end] = silence_latent)
                sil = jnp.broadcast_to(
                    self._silence_frames(t), (b, t, audio_dim)
                )[:, :, :src_dim]
                src = jnp.where(inside[None, :, None], sil, src)
            else:
                # cover / extract / complete / spanless lego: regenerate all,
                # conditioned on the full source (handler.py:2176-2204)
                chunk = jnp.ones((b, t, mask_dim), jnp.float32)
        return jnp.concatenate([src, chunk.astype(jnp.float32)], axis=-1)

    # -- generation ---------------------------------------------------------

    def max_batch_for_frames(self, frames: int) -> int:
        """HBM-admission batch cap at a frame bucket.  The continuous batcher
        consults this (``ContinuousBatcher(max_batch_for=...)``) before
        padding requests up into one merged dispatch, so merges never exceed
        what the plan admits (the engine's own clamp would truncate a
        multi-item request)."""
        from acestep_tpu import memory_planner as mp

        if self._param_bytes is None:
            self._param_bytes = mp.tree_bytes(self.dit_params) + mp.tree_bytes(self.vae_params)
            self._dit_bf16_bytes = mp.dequant_bf16_bytes(self.dit_params)
        plan = mp.plan_request(
            self.dit_cfg, self.vae_cfg, self._param_bytes, 64,
            bucket_frames(frames), dit_bf16_bytes=self._dit_bf16_bytes,
        )
        return max(1, plan.max_batch)

    def generate(self, req: GenerationRequest) -> GenerationResult:
        t0 = time.perf_counter()
        time_costs: Dict[str, float] = {}

        b = req.batch_size
        # HBM admission control (the reference's VRAM guard, handler.py:1297-1387):
        # clamp batch before launch rather than OOM mid-flight
        from acestep_tpu import memory_planner as mp

        if self._param_bytes is None:
            self._param_bytes = mp.tree_bytes(self.dit_params) + mp.tree_bytes(self.vae_params)
            self._dit_bf16_bytes = mp.dequant_bf16_bytes(self.dit_params)
        plan = mp.plan_request(
            self.dit_cfg, self.vae_cfg, self._param_bytes, b,
            frames_for_duration(req.duration_s),
            dit_bf16_bytes=self._dit_bf16_bytes,
        )
        if plan.max_batch < b:
            import warnings

            warnings.warn(
                f"HBM planner clamped batch {b} -> {plan.max_batch} "
                f"({plan.detail})", stacklevel=2)
            b = plan.max_batch
        durations = (
            list(req.durations_s) if req.durations_s
            else [req.duration_s] * b
        )
        if len(durations) != b:
            durations = (durations * b)[:b]
        item_valid = [frames_for_duration(d) for d in durations]
        t_valid = max(item_valid)
        t = bucket_frames(t_valid)
        audio_dim = self.dit_cfg.audio_acoustic_hidden_dim

        enc, enc_mask = self.build_condition(req, b)
        if enc.shape[0] == 1 and b > 1:
            enc = jnp.broadcast_to(enc, (b,) + enc.shape[1:])
            enc_mask = jnp.broadcast_to(enc_mask, (b,) + enc_mask.shape[1:])
        ctx = self.build_context_latents(req, b, t, t_valid)
        _fence(enc)
        time_costs["condition_time_cost"] = time.perf_counter() - t0

        seeds = list(req.seeds) if req.seeds else list(range(b))
        if len(seeds) < b:
            seeds = (seeds * b)[:b]
        noise = sampler.make_noise(seeds, (b, t, audio_dim))

        attn_mask = None
        use_attn_mask = t != t_valid or len(set(item_valid)) > 1
        if use_attn_mask:
            valid_arr = jnp.asarray(item_valid, jnp.int32)[:, None]
            attn_mask = (jnp.arange(t)[None, :] < valid_arr).astype(jnp.int32)

        use_cfg = req.guidance_scale != 1.0
        if use_cfg:
            schedule = sampler.get_base_timestep_schedule(req.infer_steps, req.shift)
        else:
            schedule = sampler.get_timestep_schedule(req.shift, req.timesteps)

        # cover-strength condition switch (mlx_dit/generate.py:147,160-163):
        # after num_steps * strength steps, swap to the non-cover condition
        # (timbre branch masked out) and the silence context
        cover_kwargs: Dict[str, Any] = {}
        if req.task == "cover" and 0.0 <= req.audio_cover_strength < 1.0:
            cover_steps = int(round(len(schedule) * req.audio_cover_strength))
            if req.refer_latents is not None:
                req_nc = dataclasses.replace(
                    req,
                    refer_mask=np.zeros(
                        (np.asarray(req.refer_latents).shape[0],
                         np.asarray(req.refer_latents).shape[1]), np.int32),
                )
                enc_nc, enc_nc_mask = self.build_condition(req_nc, b)
                if enc_nc.shape[0] == 1 and b > 1:
                    enc_nc = jnp.broadcast_to(enc_nc, (b,) + enc_nc.shape[1:])
                    enc_nc_mask = jnp.broadcast_to(enc_nc_mask, (b,) + enc_nc_mask.shape[1:])
            else:
                enc_nc, enc_nc_mask = enc, enc_mask
            req_sil = dataclasses.replace(req, task="text2music", src_latents=None)
            ctx_nc = self.build_context_latents(req_sil, b, t, t_valid)
            cover_kwargs = dict(
                cover_steps=cover_steps,
                encoder_hidden_states_non_cover=enc_nc,
                context_latents_non_cover=ctx_nc,
                encoder_attn_mask_non_cover=enc_nc_mask,
            )

        t1 = time.perf_counter()
        # per-bucket qmm backend from the HBM plan: "xla" (dequant hoisted out
        # of the Euler scan; measured faster at every benched shape) when the
        # transient bf16 weight copy fits, else the fused Pallas streaming
        # path.  jit caches are duration-bucketed, so the first trace of each
        # bucket captures a consistent choice (ops/qlinear.trace_backend).
        from acestep_tpu.ops import qlinear as _ql

        _qmm_tok = _ql._trace_backend.set(plan.dit_qmm_backend)
        if use_cfg:
            # base-model CFG path (co-batched cond/uncond 2B forward); runs
            # under the mesh via the shard_map TP CFG sampler when present
            if req.uncond_style_token_ids is not None:
                req_u = dataclasses.replace(
                    req, style_token_ids=req.uncond_style_token_ids,
                    style_mask=req.uncond_style_mask,
                    lyric_token_ids=None, lyric_mask=None,
                    refer_latents=None, refer_mask=None,
                )
                enc_u, enc_u_mask = self.build_condition(req_u, b)
                if enc_u.shape[0] == 1 and b > 1:
                    enc_u = jnp.broadcast_to(enc_u, (b,) + enc_u.shape[1:])
                    enc_u_mask = jnp.broadcast_to(enc_u_mask, (b,) + enc_u_mask.shape[1:])
            else:
                # neutral uncond: same packed condition fully masked out
                enc_u, enc_u_mask = enc, jnp.zeros_like(enc_mask)
            if self._tp_cfg_sampler is not None:
                from acestep_tpu.parallel.sharding import shard_batch

                dp = self.mesh.devices.shape[0]
                batch_sharded = dp > 1 and b % dp == 0
                if batch_sharded:
                    noise, ctx = shard_batch(noise, self.mesh), shard_batch(ctx, self.mesh)
                    enc, enc_mask = shard_batch(enc, self.mesh), shard_batch(enc_mask, self.mesh)
                    enc_u = shard_batch(enc_u, self.mesh)
                    enc_u_mask = shard_batch(enc_u_mask, self.mesh)
                    if attn_mask is not None:
                        attn_mask = shard_batch(attn_mask, self.mesh)
                latents = self._tp_cfg_sampler(
                    self.dit_params, noise, ctx, enc, enc_mask, enc_u, enc_u_mask,
                    jax.random.key(seeds[0]), attn_mask,
                    schedule=schedule,
                    guidance_scale=req.guidance_scale,
                    cfg_interval_start=req.cfg_interval_start,
                    cfg_interval_end=req.cfg_interval_end,
                    use_adg=req.use_adg,
                    infer_method=req.infer_method,
                    use_attn_mask=use_attn_mask,
                    batch_sharded=batch_sharded,
                )
            else:
                latents = sampler.sample_latents_cfg(
                    self.dit_params, self.dit_cfg, noise, ctx,
                    enc, enc_mask, enc_u, enc_u_mask, schedule,
                    guidance_scale=req.guidance_scale,
                    cfg_interval_start=req.cfg_interval_start,
                    cfg_interval_end=req.cfg_interval_end,
                    use_adg=req.use_adg,
                    infer_method=req.infer_method,
                    sde_key=jax.random.key(seeds[0]),
                    attn_mask=attn_mask,
                    use_attn_mask=use_attn_mask,
                )
        elif self._tp_sampler is not None:
            from acestep_tpu.parallel.sharding import shard_batch

            dp = self.mesh.devices.shape[0]
            batch_sharded = dp > 1 and b % dp == 0
            if batch_sharded:
                noise = shard_batch(noise, self.mesh)
                ctx = shard_batch(ctx, self.mesh)
                enc = shard_batch(enc, self.mesh)
                enc_mask = shard_batch(enc_mask, self.mesh)
                if attn_mask is not None:
                    attn_mask = shard_batch(attn_mask, self.mesh)
                for ck in ("encoder_hidden_states_non_cover",
                           "context_latents_non_cover",
                           "encoder_attn_mask_non_cover"):
                    if ck in cover_kwargs:
                        cover_kwargs[ck] = shard_batch(cover_kwargs[ck], self.mesh)
            latents = self._tp_sampler(
                self.dit_params, noise, ctx, enc, enc_mask,
                jax.random.key(seeds[0]), attn_mask,
                schedule=schedule, infer_method=req.infer_method,
                use_attn_mask=use_attn_mask, batch_sharded=batch_sharded,
                **cover_kwargs,
            )
        else:
            latents = sampler.sample(
                self.dit_params, self.dit_cfg, noise, ctx, enc, enc_mask, schedule,
                infer_method=req.infer_method,
                sde_key=jax.random.key(seeds[0]),
                attn_mask=attn_mask,
                use_attn_mask=use_attn_mask,
                **cover_kwargs,
            )
        _fence(latents)
        _ql._trace_backend.reset(_qmm_tok)
        time_costs["diffusion_time_cost"] = time.perf_counter() - t1
        time_costs["diffusion_per_step_time_cost"] = (
            time_costs["diffusion_time_cost"] / len(schedule)
        )

        # NaN/Inf guard (handler.py:3598-3610)
        latents = jnp.nan_to_num(latents, nan=0.0, posinf=0.0, neginf=0.0)
        latents_valid = latents[:, :t_valid, :]

        t2 = time.perf_counter()
        # HBM plan drives the decode chunk (handler.py:1217-1269 VAE chunk
        # auto-sizing); clamp to [32, 512] so jit caches stay few and chunk
        # compile shapes are stable.  When the chunk covers the whole song the
        # decode is a SINGLE dispatch (frame buckets keep compiles bounded).
        vae_chunk = int(min(max(plan.vae_chunk_frames, 32), 512))
        seg_windows = _segment_windows_env(vae_chunk)
        windows = (
            vae._window_plan(t_valid, vae_chunk, None)
            if vae_chunk < t_valid else []
        )
        # any song with >=2 windows gets >=2 segments: when the fetch is
        # tunnel-bound, wall time ~= first-segment compute + total fetch, so
        # splitting mid-length songs (60-240 s at chunk 512: 3-7 windows, one
        # 2048-frame segment before) hides most of the decode compute
        if len(windows) >= 2:
            seg_windows = min(seg_windows, max(1, len(windows) // 2))
        elif (b == 1 and seg_windows > 0 and t_valid >= 192
              and os.environ.get("ACESTEP_TPU_SHORT_CLIP_SPLIT", "0") == "1"):
            # OPT-IN short-clip split: decode 10-20 s clips as two half-song
            # windows (32-frame overlap-discard seam) so the first half's d2h
            # transfer overlaps the second half's compute.  Same-day A/B on
            # the dev tunnel (docs/BENCHMARK.md round-4 fetch-overlap study):
            # at a healthy channel (~27 ms RTT, ~42 MB/s) the single-dispatch
            # path wins (0.173 s vs 0.192 s E2E) because the split's +25%
            # decode FLOPs cost more than the ~2 MB fetch it hides; enable on
            # slow channels where the fetch dominates.
            ov = 32
            stride = (t_valid + 1) // 2
            windows = vae._window_plan(t_valid, stride + 2 * ov, ov)
            seg_windows = 1
        if (
            os.environ.get("ACESTEP_TPU_VAE_FUSED", "1") != "0"
            and b == 1
            and seg_windows > 0
            and len(windows) >= 2 * seg_windows
        ):
            # SEGMENTED decode: enqueue every segment's (decode+trim+int16)
            # program asynchronously, then fetch them oldest-first — the d2h
            # transfer of segment g overlaps compute of segments g+1..
            # (0.8 overlap factor measured through the dev tunnel).  Windows
            # are re-based per segment so interior segments share one compile.
            handles = []
            for s0 in range(0, len(windows), seg_windows):
                seg = windows[s0:s0 + seg_windows]
                lo, hi = seg[0][2], seg[-1][3]
                rel = tuple(
                    (cs - lo, ce - lo, ws - lo, we - lo) for cs, ce, ws, we in seg
                )
                seg_i16, seg_scale = vae.fused_decode_windows_int16(
                    self.vae_params, self.vae_cfg,
                    latents_valid[:, lo:hi, :], rel,
                    max_window_batch=plan.vae_window_batch,
                    mesh=self._vae_mesh(),
                )
                # start the d2h transfer the moment this segment's compute
                # completes (async): transfers overlap later segments' compute
                # AND each other, instead of stacking one tunnel RTT per
                # blocking device_get (measured: 2x1MB sequential gets 110 ms
                # vs 82 ms async on the dev tunnel)
                if getattr(seg_i16, "is_fully_addressable", True):
                    seg_i16.copy_to_host_async()
                handles.append((seg_i16, seg_scale))
            if getattr(latents_valid, "is_fully_addressable", True):
                latents_valid.copy_to_host_async()
            # device executes in enqueue order, so fencing the LAST segment's
            # scale fences all decode compute (no-op with fences disabled —
            # vae_compute then reads as enqueue time, like the fused path)
            _fence(handles[-1][1])
            time_costs["vae_compute_time_cost"] = time.perf_counter() - t2
            t_fetch = time.perf_counter()
            fetched = [(_host_np(i16_h), _host_np(s_h))
                       for i16_h, s_h in handles]
            latents_np = _host_np(latents_valid).astype(np.float32)
            time_costs["audio_fetch_time_cost"] = time.perf_counter() - t_fetch
            scales = [float(s) for _, s in fetched]
            scale = min(scales)
            segments = []
            for (i16_g, _), s_g in zip(fetched, scales):
                seg_arr = np.asarray(i16_g).reshape(1, -1, self.vae_cfg.audio_channels)
                if s_g != scale:
                    # only when some segment peaked >0.99: re-quantize this
                    # segment at the global scale (<=1 LSB double rounding on
                    # a few-MB segment; the quiet-audio path never pays it)
                    seg_arr = np.round(
                        seg_arr.astype(np.float32) * (scale / s_g)
                    ).astype(np.int16)
                segments.append(seg_arr)
            time_costs["vae_time_cost"] = time.perf_counter() - t2
            time_costs["vae_overlapped"] = 1.0
            time_costs["total_time_cost"] = time.perf_counter() - t0
            return GenerationResult(
                audio_i16_segments=segments,
                audio_scale=float(scale),
                latents=latents_np,
                sample_rate=self.vae_cfg.sampling_rate,
                time_costs=time_costs,
                seeds=seeds,
                audio_lengths=[v * self.vae_cfg.hop_length for v in item_valid],
            )
        if os.environ.get("ACESTEP_TPU_VAE_FUSED", "1") != "0":
            # whole tiled decode as ONE jitted program + one fetch that also
            # carries the latents (per-dispatch/per-fetch roundtrips cost
            # ~30 ms each through the dev tunnel)
            i16, scale = vae.fused_tiled_decode_int16(
                self.vae_params, self.vae_cfg, latents_valid,
                chunk_frames=vae_chunk,
                max_window_batch=plan.vae_window_batch,
                mesh=self._vae_mesh(),
            )
            _fence(scale)   # scale depends on ALL audio: a true decode fence
            time_costs["vae_compute_time_cost"] = time.perf_counter() - t2
            # the audio fetch is d2h-bound, not TPU-bound: ~115 MB int16 at
            # 600 s costs ~18 s through the ~6 MB/s dev tunnel vs ~10 ms over
            # PCIe on a real host — report it separately so the compute number
            # is comparable across hosts
            if all(getattr(a, "is_fully_addressable", True)
                   for a in (i16, scale, latents_valid)):
                # one device_get call = one tunnel roundtrip for all three
                i16, scale, latents_np = jax.device_get((i16, scale, latents_valid))
            else:   # mesh spans processes: DCN all-gather before the fetch
                i16, scale, latents_np = (
                    _host_np(i16), _host_np(scale), _host_np(latents_valid))
            time_costs["audio_fetch_time_cost"] = (
                time.perf_counter() - t2
                - time_costs["vae_compute_time_cost"]
            )
            b_out = latents_valid.shape[0]
            audio_i16 = np.asarray(i16).reshape(b_out, -1, self.vae_cfg.audio_channels)
            latents_np = np.asarray(latents_np, np.float32)
            time_costs["vae_time_cost"] = time.perf_counter() - t2
            time_costs["total_time_cost"] = time.perf_counter() - t0
            return GenerationResult(
                audio_i16=audio_i16,
                audio_scale=float(scale),
                latents=latents_np,
                sample_rate=self.vae_cfg.sampling_rate,
                time_costs=time_costs,
                seeds=seeds,
                audio_lengths=[v * self.vae_cfg.hop_length for v in item_valid],
            )
        else:
            audio = vae.tiled_decode(
                self.vae_params, self.vae_cfg, latents_valid,
                chunk_frames=vae_chunk, overlap_frames=None,
                decode_fn=self._vae_decode_jit,
                max_window_batch=plan.vae_window_batch,
                host_assemble=True,   # audio goes to numpy anyway; keeps HBM flat
            )
            audio_np = np.asarray(audio, dtype=np.float32)
            latents_np = np.asarray(latents_valid, dtype=np.float32)
        time_costs["vae_time_cost"] = time.perf_counter() - t2
        time_costs["total_time_cost"] = time.perf_counter() - t0

        return GenerationResult(
            audio=audio_np,
            latents=latents_np,
            sample_rate=self.vae_cfg.sampling_rate,
            time_costs=time_costs,
            seeds=seeds,
            audio_lengths=[v * self.vae_cfg.hop_length for v in item_valid],
        )


    def encode_src_audio(self, audio: np.ndarray) -> np.ndarray:
        """Raw source waveform [L, C] -> src latents [1, T, 64] for the
        repaint/cover/extract/lego/complete tasks (handler.py:2102-2208 builds
        context from the full-length source; unlike the 750-frame timbre
        window this keeps every frame)."""
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[:, None]
        if audio.shape[1] == 1:
            audio = np.repeat(audio, self.vae_cfg.audio_channels, axis=1)
        hop = self.vae_cfg.hop_length
        t_frames = max(1, audio.shape[0] // hop)
        lat = vae.tiled_encode(
            self.vae_params, self.vae_cfg,
            jnp.asarray(audio[None, : t_frames * hop, :]),
            chunk_frames=128, overlap_frames=32,
        )
        return np.asarray(lat, np.float32)

    def encode_refer_audio(
        self, audios: Sequence[np.ndarray], max_frames: Optional[int] = None
    ) -> np.ndarray:
        """Raw refer-audio clips -> timbre-conditioning latents [1, n, Lr, 64].

        Each waveform [L, C] is VAE-encoded and clamped to the reference's
        30 s / 750-frame timbre window (handler.py:2388-2453 refer-audio ->
        timbre latents; TIMBRE_FIX_FRAMES clamp :2425)."""
        from acestep_tpu.constants import TIMBRE_FIX_FRAMES

        max_frames = max_frames or TIMBRE_FIX_FRAMES
        hop = self.vae_cfg.hop_length
        clips = []
        for audio in audios:
            audio = np.asarray(audio, np.float32)
            if audio.ndim == 1:
                audio = audio[:, None]
            if audio.shape[1] == 1:
                audio = np.repeat(audio, self.vae_cfg.audio_channels, axis=1)
            t_frames = max(1, min(audio.shape[0] // hop, max_frames))
            lat = vae.tiled_encode(
                self.vae_params, self.vae_cfg,
                jnp.asarray(audio[None, : t_frames * hop, :]),
                chunk_frames=128, overlap_frames=32,
            )
            clips.append(np.asarray(lat[0], np.float32))
        lr = max(c.shape[0] for c in clips)
        out = np.zeros((1, len(clips), lr, clips[0].shape[1]), np.float32)
        for i, c in enumerate(clips):
            out[0, i, : c.shape[0]] = c
        return out

    # -- lyric alignment (handler.py:3792 get_lyric_timestamp / :4011 score) --

    def get_lyric_timestamps(
        self, latents: np.ndarray, req: GenerationRequest,
        lyric_lines: Optional[Sequence[str]] = None,
        line_token_counts: Optional[Sequence[int]] = None,
    ):
        """Token timestamps (s) for the request's lyric tokens against generated
        latents, via the 1-step re-noised cross-attention probe + DTW.

        Returns (stamps [n_lyric], lrc_text or None)."""
        from acestep_tpu import alignment

        if req.lyric_token_ids is None:
            raise ValueError("request has no lyric tokens to align")
        lat = jnp.asarray(latents, jnp.float32)
        b, t_valid = lat.shape[0], lat.shape[1]
        t = bucket_frames(t_valid)
        if t != t_valid:
            lat = jnp.pad(lat, ((0, 0), (0, t - t_valid), (0, 0)))
        enc, enc_mask = self.build_condition(req, b)
        ctx = self.build_context_latents(req, b, t, t_valid)
        maps = alignment.cross_attention_maps(
            self.dit_params, self.dit_cfg, lat, ctx, enc, enc_mask,
        )
        n_lyric = (
            int(np.asarray(req.lyric_mask).sum(axis=1)[0])
            if req.lyric_mask is not None
            else int(np.asarray(req.lyric_token_ids).shape[1])
        )
        patch_seconds = self.dit_cfg.patch_size / LATENT_RATE
        stamps = alignment.token_timestamps(
            np.asarray(maps[0], np.float32), n_lyric, patch_seconds
        )
        lrc = None
        if lyric_lines is not None and line_token_counts is not None:
            lrc = alignment.to_lrc(lyric_lines, line_token_counts, stamps)
        return stamps, lrc

    def get_lyric_score(self, latents: np.ndarray, req: GenerationRequest) -> float:
        """Lyric-alignment quality score (on-path attention mass ratio)."""
        from acestep_tpu import alignment

        lat = jnp.asarray(latents, jnp.float32)
        b, t_valid = lat.shape[0], lat.shape[1]
        t = bucket_frames(t_valid)
        if t != t_valid:
            lat = jnp.pad(lat, ((0, 0), (0, t - t_valid), (0, 0)))
        enc, enc_mask = self.build_condition(req, b)
        ctx = self.build_context_latents(req, b, t, t_valid)
        maps = alignment.cross_attention_maps(
            self.dit_params, self.dit_cfg, lat, ctx, enc, enc_mask,
        )
        n_lyric = (
            int(np.asarray(req.lyric_mask).sum(axis=1)[0])
            if req.lyric_mask is not None
            else int(np.asarray(req.lyric_token_ids).shape[1])
        )
        return alignment.alignment_score(np.asarray(maps[0], np.float32), n_lyric)


def build_random_engine(
    key: jax.Array = None,
    dit_cfg: Optional[DiTConfig] = None,
    vae_cfg: Optional[VAEConfig] = None,
    text_cfg: Optional[QwenConfig] = None,
    quant: Optional[str] = None,
    dtype=jnp.bfloat16,
) -> AceStepEngine:
    """Random-weight engine for tests/benches (no public checkpoints in CI)."""
    from acestep_tpu.quant import quantize_tree_jax

    key = key if key is not None else jax.random.key(0)
    dit_cfg = dit_cfg or DiTConfig()
    vae_cfg = vae_cfg or VAEConfig()
    text_cfg = text_cfg or QwenConfig()
    k1, k2, k3 = jax.random.split(key, 3)

    # init + quantize entirely on the host CPU backend: hundreds of small one-off
    # TPU compiles (one per array shape) would otherwise dominate startup through
    # a remote-compile backend; one device_put ships the finished tree.
    # one jitted build per model: init + quantize + stack in a single compiled
    # graph on the default device (the host CPU here is far too slow for
    # billion-param numpy work, and per-shape eager dispatch would mean hundreds
    # of tiny one-off compiles; a single graph compiles once and caches)
    def build_dit(k):
        p = dit.init_params(k, dit_cfg, dtype=dtype)
        if quant:
            p = quantize_tree_jax(p, quant)
        return dit.stack_params(p)

    def build_text(k):
        p = qwen.init_params(k, text_cfg, dtype=dtype)
        if quant:
            p = quantize_tree_jax(p, quant)
        return qwen.stack_params(p)

    # VAE compute dtype: f32 default (precision-sensitive Snake/convT chain,
    # SURVEY §7.3); ACESTEP_TPU_VAE_DTYPE=bf16 opts into bf16 convs (Snake
    # stays f32 internally) for ~2x conv throughput once quality-gated
    import os as _os

    vae_dt = (jnp.bfloat16
              if _os.environ.get("ACESTEP_TPU_VAE_DTYPE", "f32") in ("bf16", "bfloat16")
              else jnp.float32)
    dit_params = jax.jit(build_dit)(k1)
    vae_params = jax.jit(lambda k: vae.init_params(k, vae_cfg, dtype=vae_dt))(k2)
    text_params = jax.jit(build_text)(k3)
    return AceStepEngine(
        dit_params, dit_cfg, vae_params, vae_cfg, text_params, text_cfg
    )
