"""Per-phase roofline accounting: algorithmic bytes / FLOPs vs chip peaks.

BASELINE.json's metric asks for latents/s and tokens/s per chip and the north
star demands kernels "at speed-of-light"; this module provides the analytic
side of that claim so every measured phase time converts to achieved GB/s +
FLOP/s and a %-of-bound (tools/roofline.py runs the measurements;
docs/BENCHMARK.md publishes the table).

Byte counts are ALGORITHMIC lower bounds (each weight byte streamed once per
step, each activation written+read once across fusion boundaries); achieved
numbers above ~70 % of a bound mean the phase is at that bound's
speed-of-light for this algorithm.

Reference analog: the GGML runtime's per-phase profile hooks
(acestep_ggml.cpp:1457-1477 DIT_PROFILE, :943-963 VAE_PROFILE) print raw ms;
this converts ms to distance-from-roof.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig

# Per-chip peaks (bf16 MXU FLOP/s, HBM B/s).  Sources: public TPU spec sheets
# (v5e: 197 bf16 TFLOP/s, 819 GB/s; v5p: 459/2765; v4: 275/1228;
# v6e: 918/1640).  int8 MXU throughput is 2x bf16 on v5e/v6e.
CHIP_PEAKS = {
    "v5e": {"bf16_flops": 197e12, "int8_ops": 394e12, "hbm_bps": 819e9},
    "v5p": {"bf16_flops": 459e12, "int8_ops": 918e12, "hbm_bps": 2765e9},
    "v4": {"bf16_flops": 275e12, "int8_ops": 275e12, "hbm_bps": 1228e9},
    "v6e": {"bf16_flops": 918e12, "int8_ops": 1836e12, "hbm_bps": 1640e9},
}


def detect_chip() -> str:
    """Map jax device_kind to a CHIP_PEAKS key (default v5e)."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return "v5e"
    for key, probe in (("v6e", "v6"), ("v5p", "v5p"), ("v5e", "v5 lite"),
                       ("v5e", "v5e"), ("v4", "v4")):
        if probe in kind:
            return key
    return "v5e"


def tree_quant_bytes(tree: Any) -> int:
    """Bytes of every leaf (QuantTensor aux arrays + plain arrays)."""
    from acestep_tpu.memory_planner import tree_bytes

    return tree_bytes(tree)


# ---------------------------------------------------------------------------
# DiT Euler step
# ---------------------------------------------------------------------------

def dit_step_weight_bytes(stacked_params: Dict[str, Any]) -> int:
    """Weight bytes streamed by ONE DiT forward: the transformer stack + the
    projection/embedding heads, EXCLUDING the condition encoders (their
    outputs are cached across all 8 steps — pipeline.encode_condition runs
    once per request)."""
    skip = ("lyric_encoder", "timbre_encoder", "text_projector")
    total = 0
    for k, v in stacked_params.items():
        if k in skip:
            continue
        total += tree_quant_bytes(v)
    return total


def dit_step_flops(cfg: DiTConfig, frames: int, cond_tokens: int,
                   batch: int = 1) -> int:
    """Matmul + attention FLOPs of one DiT forward (2*K*N*T per matmul).

    Cross-attention K/V projections are EXCLUDED (cached across steps, the
    MLX port's optimization replicated in models/dit.py:379)."""
    t = frames // cfg.patch_size
    h = cfg.hidden_size
    qdim = cfg.num_attention_heads * cfg.head_dim
    kvdim = cfg.num_key_value_heads * cfg.head_dim
    inter = cfg.intermediate_size
    per_layer = 0
    # self-attn projections: q, k, v, o
    per_layer += 2 * t * h * (qdim + 2 * kvdim) + 2 * t * qdim * h
    # cross-attn: q + o only (kv cached)
    per_layer += 2 * t * h * qdim + 2 * t * qdim * h
    # mlp
    per_layer += 2 * t * h * (2 * inter) + 2 * t * inter * h
    total = 0
    for lt in cfg.layer_types:
        t_eff = min(t, cfg.sliding_window) if lt == "sliding_attention" else t
        # scores + value-weighted sum, q heads against t_eff keys
        attn = 4 * t * t_eff * qdim
        cross = 4 * t * cond_tokens * qdim
        total += per_layer + attn + cross
    # patchify/unpatchify + heads (small)
    total += 2 * t * (cfg.in_channels * cfg.patch_size) * h
    total += 2 * t * h * (cfg.audio_acoustic_hidden_dim * cfg.patch_size)
    return batch * total


# ---------------------------------------------------------------------------
# VAE decode
# ---------------------------------------------------------------------------

def _vae_decoder_layers(cfg: VAEConfig, frames: int):
    """Yield (k, cin, cout, l_in, l_out) for every decoder conv at ``frames``
    input latent frames (mirrors models/vae.decode's structure)."""
    ch = cfg.decoder_channels
    cm = (1,) + tuple(cfg.channel_multiples)
    strides = cfg.upsampling_ratios
    l = frames
    yield (7, cfg.decoder_input_channels, ch * cm[-1], l, l)      # conv1
    for i, s in enumerate(strides):
        cin = ch * cm[len(strides) - i]
        cout = ch * cm[len(strides) - i - 1]
        yield (2 * s, cin, cout, l, l * s)                        # conv_t
        l *= s
        for _ in range(3):                                        # res units
            yield (7, cout, cout, l, l)
            yield (1, cout, cout, l, l)
    yield (7, ch, cfg.audio_channels, l, l)                       # conv2


def vae_decode_flops(cfg: VAEConfig, frames: int, batch: int = 1) -> int:
    """Conv MACs*2 of one decode of ``frames`` latent frames (subpixel
    transposed-conv formulation: ~1/s the dilated-path MACs, the shipped
    default)."""
    total = 0
    for k, cin, cout, l_in, l_out in _vae_decoder_layers(cfg, frames):
        if l_out > l_in:                  # transposed conv, subpixel: per
            total += 2 * l_in * k * cin * cout   # input position, k taps
        else:
            total += 2 * l_out * k * cin * cout
    return batch * total


def vae_decode_act_bytes(cfg: VAEConfig, frames: int, batch: int = 1,
                         dtype_bytes: int = 4) -> int:
    """Activation traffic lower bound: each conv reads its input once and
    writes its output once (Snake fuses into the neighbouring conv under
    XLA).  Weights are negligible (~8 MB vs GBs of activations)."""
    total = 0
    for k, cin, cout, l_in, l_out in _vae_decoder_layers(cfg, frames):
        total += (l_in * cin + l_out * cout) * dtype_bytes
    return batch * total


# ---------------------------------------------------------------------------
# LM decode
# ---------------------------------------------------------------------------

def lm_decode_bytes(params: Dict[str, Any], cfg: QwenConfig,
                    cache_len: int = 512, batch: int = 1) -> int:
    """Bytes streamed per decode step: every weight once (batch-independent)
    + the int8 KV cache once per item."""
    w = tree_quant_bytes({k: v for k, v in params.items()})
    kv = (2 * cfg.num_hidden_layers * cfg.num_key_value_heads
          * cache_len * (cfg.head_dim + 4))      # int8 + f32 scale
    return w + batch * kv


@dataclasses.dataclass
class RooflinePoint:
    phase: str
    time_s: float
    bytes_: int
    flops: int
    chip: str = ""

    def summary(self) -> Dict[str, Any]:
        chip = self.chip or detect_chip()
        peaks = CHIP_PEAKS[chip]
        bps = self.bytes_ / self.time_s
        fps = self.flops / self.time_s
        return {
            "phase": self.phase,
            "time_ms": round(self.time_s * 1e3, 3),
            "GB_s": round(bps / 1e9, 1),
            "TFLOP_s": round(fps / 1e12, 2),
            "pct_hbm_roof": round(100 * bps / peaks["hbm_bps"], 1),
            "pct_mxu_roof": round(100 * fps / peaks["bf16_flops"], 1),
            "bound": "hbm" if (bps / peaks["hbm_bps"]
                               > fps / peaks["bf16_flops"]) else "mxu",
            "chip": chip,
        }
