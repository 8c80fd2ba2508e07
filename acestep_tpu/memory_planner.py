"""Static HBM budget planner (TPU analog of the reference's VRAM admission
control: _vram_guard_reduce_batch handler.py:1297-1387, VAE chunk auto-sizing
:1217-1269, gpu_config tiers).

On TPU there is no CPU-offload ladder; instead the planner sizes batch and VAE
chunking AHEAD of launch from a static activation-memory model, so requests
never OOM mid-flight."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from acestep_tpu.config import DiTConfig, VAEConfig

GiB = 1024 ** 3

# per-chip HBM for known TPU generations (bytes)
HBM_BYTES = {
    "v4": 32 * GiB,
    "v5e": 16 * GiB,
    "v5p": 95 * GiB,
    "v6e": 32 * GiB,
}
DEFAULT_HBM = 16 * GiB          # v5e
SAFETY_MARGIN = 1.5 * GiB       # compiler scratch + fragmentation headroom


def detect_hbm_bytes() -> int:
    """Per-chip HBM; ACESTEP_TPU_MAX_HBM_GB overrides for tier simulation
    (the reference's MAX_CUDA_VRAM fault-injection knob, gpu_config.py:286-300)."""
    import os

    cap = os.environ.get("ACESTEP_TPU_MAX_HBM_GB")
    if cap:
        try:
            return int(float(cap) * GiB)
        except ValueError:
            pass
    try:
        import jax

        d = jax.devices()[0]
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
        kind = getattr(d, "device_kind", "").lower()
        for gen, size in HBM_BYTES.items():
            if gen in kind:
                return size
    except Exception:
        pass
    return DEFAULT_HBM


def tree_bytes(params: Any) -> int:
    import jax

    return sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(params))


def dequant_bf16_bytes(params: Any) -> int:
    """Transient bf16 copy size if XLA hoists the dequant of every QuantTensor
    (the cost of the "xla" qmm backend; zero for unquantized trees)."""
    import jax

    from acestep_tpu.quant import QuantTensor

    total = 0
    for leaf in jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QuantTensor)
    ):
        if isinstance(leaf, QuantTensor):
            k, n = leaf.shape
            total += 2 * k * n
    return total


def dit_activation_bytes(cfg: DiTConfig, batch: int, frames: int) -> int:
    """Peak activation estimate for one DiT forward at bf16.

    Below the blocked-attention threshold, dominated by dense f32 attention
    scores (B * heads * Tp^2 * 4).  At or above it, the banded/flash kernels
    (ops.blocked_attention) cap scores at O(Tp * block): banded layers hold
    Tp * 3*window scores (+ the 3-neighborhood K/V copies), flash layers
    Tp * block_k scores per scan step."""
    from acestep_tpu.ops.blocked_attention import blocked_attn_threshold

    tp = (frames + cfg.patch_size - 1) // cfg.patch_size
    if tp >= blocked_attn_threshold():
        # banded: scores Tp*3W f32 + k3/v3 copies 2*(Tp*3S*D) bf16 per kv head;
        # flash: scores Tp*block_k f32 + f32 accumulator Tp*D per head
        w3 = 3 * max(cfg.sliding_window, 1)
        flash_blk = 1024
        per_head_scores = 4 * tp * max(w3, flash_blk)
        kv_copies = 2 * 2 * cfg.num_key_value_heads * tp * 3 * cfg.head_dim
        accum = 4 * cfg.num_attention_heads * tp * cfg.head_dim
        scores = batch * (cfg.num_attention_heads * per_head_scores + kv_copies + accum)
    else:
        scores = 4 * batch * cfg.num_attention_heads * tp * tp    # f32 dense
    hidden = 2 * batch * tp * cfg.hidden_size
    mlp = 2 * batch * tp * cfg.intermediate_size
    # ~6 live hidden-sized tensors + 2 mlp-sized + 1 score tensor at peak
    return scores + 6 * hidden + 2 * mlp


def vae_decode_bytes_per_frame(cfg: VAEConfig) -> int:
    """f32 activation bytes per latent frame of decode (full-rate conv stack:
    channels * hop * 4 bytes with ~4 live tensors at the widest layer)."""
    widest = cfg.decoder_channels * max(cfg.channel_multiples)
    return 4 * widest * cfg.hop_length // max(cfg.upsampling_ratios) * 4


@dataclasses.dataclass
class Plan:
    max_batch: int
    vae_chunk_frames: int
    fits: bool
    detail: Dict[str, int]
    vae_window_batch: int = 4
    dit_qmm_backend: str = "pallas"   # "xla" when the bf16 dequant copy fits


def plan_request(
    dit_cfg: DiTConfig,
    vae_cfg: VAEConfig,
    param_bytes: int,
    batch: int,
    frames: int,
    hbm_bytes: Optional[int] = None,
    dit_bf16_bytes: int = 0,
) -> Plan:
    """Clamp batch / VAE chunk so the request fits in HBM (admission control)."""
    hbm = hbm_bytes if hbm_bytes is not None else detect_hbm_bytes()
    budget = hbm - SAFETY_MARGIN - param_bytes

    b = max(1, batch)
    while b > 1 and dit_activation_bytes(dit_cfg, b, frames) > budget:
        b -= 1
    dit_bytes = dit_activation_bytes(dit_cfg, b, frames)

    # qmm backend: pallas everywhere.  Round 2 preferred "xla" (dequant
    # hoisted out of the Euler scan) when the transient bf16 weight copy fit —
    # the fused pallas kernels then lost 41 vs 28 ms/step at 60 s q4_0.  The
    # round-3 qkv/gate-up weight fusion + fat K-tiles close that: measured
    # fused:pallas 24.96 vs fused:xla 24.97 ms/step at 60 s q4_0 and 8.12 vs
    # 8.15 at 10 s q8_0 (tools/bench_dit_step.py, docs/BENCHMARK.md) — and
    # pallas streams quantized bytes instead of holding a bf16 copy of the
    # whole DiT (q8: 2.4 GB less HBM residency).  ACESTEP_TPU_QMM_BACKEND
    # still forces either path.
    qmm_backend = "pallas"

    vae_budget = budget - 0  # VAE runs after diffusion; latents are small
    per_frame = vae_decode_bytes_per_frame(vae_cfg) * b
    # start at the reference's auto chunk (512, handler.py:1217) and halve
    # under tight budgets; large chunks matter on TPU because each decode
    # dispatch costs a host roundtrip (a 600 s song at chunk 128 is ~230
    # dispatches — the measured round-2 VAE-phase dominator on the dev tunnel)
    chunk = 512
    while chunk > 16 and chunk * per_frame > vae_budget:
        chunk //= 2
    # stacked decode windows multiply the per-chunk activation; total decoded
    # audio also stays resident until assembly — scale the window batch down
    # for long songs / tight budgets (600 s E2E on 16 GB needs < 4).
    # wb counts (item, window) pairs — the decode map's unit after the
    # configs[3] fix (vae._decode_window_groups flattens item x window), so it
    # budgets PER-ITEM frame bytes, not the whole merged batch per window.
    per_frame_item = vae_decode_bytes_per_frame(vae_cfg)

    def _audio_resident(nb: int) -> int:
        # decoded audio stays resident until assembly; scales with batch
        return 2 * 4 * frames * vae_cfg.hop_length * vae_cfg.audio_channels * nb

    wb = 4
    while wb > 1 and wb * chunk * per_frame_item + _audio_resident(b) > vae_budget // 2:
        wb //= 2
    # the b-scaled resident-audio term can exceed the VAE budget even at wb=1
    # (e.g. a merge of several long-duration requests that passed the DiT
    # activation check) — clamp b too, don't just shrink the window batch
    while b > 1 and chunk * per_frame_item + _audio_resident(b) > vae_budget // 2:
        b -= 1
        dit_bytes = dit_activation_bytes(dit_cfg, b, frames)
    # the audio-resident clamp may have reduced b — refresh the b-scaled
    # per-frame figure so `fits` and the reported detail match the final plan
    per_frame = per_frame_item * b
    fits = (dit_bytes <= budget and chunk * per_frame <= vae_budget
            and chunk * per_frame_item + _audio_resident(b) <= vae_budget // 2)
    return Plan(
        max_batch=b,
        vae_chunk_frames=chunk,
        vae_window_batch=wb,
        fits=fits,
        dit_qmm_backend=qmm_backend,
        detail={
            "hbm_bytes": hbm,
            "param_bytes": param_bytes,
            "dit_activation_bytes": dit_bytes,
            "vae_bytes_per_frame": per_frame,
            "budget": int(budget),
        },
    )
