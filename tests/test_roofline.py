"""Roofline accounting sanity: analytic bytes/FLOPs vs direct counts."""

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu import roofline as R
from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig


def test_chip_peaks_table():
    for chip, p in R.CHIP_PEAKS.items():
        assert p["bf16_flops"] > 0 and p["hbm_bps"] > 0
    assert R.detect_chip() in R.CHIP_PEAKS


def test_dit_step_weight_bytes_excludes_cached_encoders():
    from acestep_tpu.models import dit

    cfg = DiTConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=8, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=1, num_timbre_encoder_hidden_layers=1,
        timbre_hidden_dim=8,
    )
    params = dit.stack_params(dit.init_params(jax.random.key(0), cfg,
                                              dtype=jnp.float32))
    total = R.tree_quant_bytes(params)
    step = R.dit_step_weight_bytes(params)
    enc = sum(R.tree_quant_bytes(params[k])
              for k in ("lyric_encoder", "timbre_encoder", "text_projector")
              if k in params)
    assert step == total - enc
    assert 0 < step < total


def test_dit_step_flops_scales_with_tokens():
    cfg = DiTConfig()
    f1 = R.dit_step_flops(cfg, 256, 320)
    f2 = R.dit_step_flops(cfg, 512, 320)
    # matmul term is linear in T; attention superlinear on full layers
    assert 2.0 <= f2 / f1 < 2.6
    # magnitude sanity: ~2*weights*tokens dominates; flagship DiT ~2.4B
    # matmul params, 128 tokens at 10 s -> O(6e11) FLOPs
    assert 1e11 < f1 < 2e12


def test_vae_decoder_layer_walk_matches_decode_shapes():
    """The analytic layer walk must produce the same output length the real
    decode does (hop upsampling), and FLOPs must scale ~linearly in frames."""
    cfg = VAEConfig()
    layers = list(R._vae_decoder_layers(cfg, 100))
    assert layers[-1][4] == 100 * cfg.hop_length   # final l_out = frames*hop
    f100 = R.vae_decode_flops(cfg, 100)
    f200 = R.vae_decode_flops(cfg, 200)
    assert abs(f200 / f100 - 2.0) < 0.01
    assert R.vae_decode_act_bytes(cfg, 100) > 0


def test_lm_decode_bytes_counts_weights_and_kv():
    from acestep_tpu.models import qwen
    from acestep_tpu.quant import quantize_tree_jax

    cfg = QwenConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     intermediate_size=128, head_dim=16)
    params = qwen.stack_params(
        quantize_tree_jax(qwen.init_params(jax.random.key(0), cfg,
                                           dtype=jnp.bfloat16), "q8_0"))
    b0 = R.lm_decode_bytes(params, cfg, cache_len=128)
    b1 = R.lm_decode_bytes(params, cfg, cache_len=256)
    kv_delta = b1 - b0
    expect = 2 * cfg.num_hidden_layers * cfg.num_key_value_heads * 128 * (16 + 4)
    assert kv_delta == expect


def test_roofline_point_summary():
    pt = R.RooflinePoint(phase="x", time_s=0.001, bytes_=819e6, flops=197e9,
                         chip="v5e")
    s = pt.summary()
    assert abs(s["pct_hbm_roof"] - 100.0) < 0.5
    assert abs(s["pct_mxu_roof"] - 100.0) < 0.5
    assert s["bound"] in ("hbm", "mxu")
