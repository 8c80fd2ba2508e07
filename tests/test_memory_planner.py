"""HBM admission-control planner tests."""

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.memory_planner import GiB, Plan, dit_activation_bytes, plan_request


def test_batch_clamped_under_small_hbm():
    cfg = DiTConfig()
    vae = VAEConfig()
    params = 2 * GiB
    # blocked attention makes 600s/b8 fit 16G; clamping now kicks in lower
    plan = plan_request(cfg, vae, params, batch=8, frames=15000, hbm_bytes=16 * GiB)
    assert plan.max_batch == 8             # banded/flash path: fits
    small = plan_request(cfg, vae, params, batch=8, frames=15000, hbm_bytes=8 * GiB)
    assert small.max_batch < 8             # ...but not in 8G
    assert small.max_batch >= 1


def test_small_request_fits_full_batch():
    cfg = DiTConfig()
    vae = VAEConfig()
    plan = plan_request(cfg, vae, 2 * GiB, batch=8, frames=750, hbm_bytes=16 * GiB)
    assert plan.max_batch == 8
    assert plan.fits


def test_activation_model_scales_quadratically_with_frames():
    cfg = DiTConfig()
    a = dit_activation_bytes(cfg, 1, 1000)
    b = dit_activation_bytes(cfg, 1, 2000)
    assert b > 2.5 * a                     # attention term grows superlinearly


def test_vae_chunk_shrinks_when_tight():
    cfg = DiTConfig()
    vae = VAEConfig()
    plan_big = plan_request(cfg, vae, 2 * GiB, 1, 750, hbm_bytes=16 * GiB)
    plan_small = plan_request(cfg, vae, 13 * GiB, 1, 750, hbm_bytes=16 * GiB)
    assert plan_small.vae_chunk_frames <= plan_big.vae_chunk_frames


def test_engine_clamps_batch(monkeypatch):
    """engine.generate consults the planner and clamps oversized batches."""
    import warnings

    import jax
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
    from acestep_tpu.models import dit as dit_mod
    from acestep_tpu.models import qwen as qwen_mod
    from acestep_tpu.models import vae as vae_mod
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest
    from acestep_tpu import memory_planner

    # pretend the chip has very little HBM
    monkeypatch.setattr(memory_planner, "detect_hbm_bytes", lambda: 3 * GiB)

    dit_cfg = DiTConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=8, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
        timbre_hidden_dim=8,
    )
    vae_cfg = VAEConfig(audio_channels=2, encoder_hidden_size=16, decoder_channels=8,
                        decoder_input_channels=8, downsampling_ratios=(2, 4, 4),
                        channel_multiples=(1, 2, 4))
    text_cfg = QwenConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=2, num_key_value_heads=2,
                          intermediate_size=64, head_dim=16)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    engine = AceStepEngine(
        dit_mod.init_params(k1, dit_cfg, dtype=jnp.float32), dit_cfg,
        vae_mod.init_params(k2, vae_cfg), vae_cfg,
        qwen_mod.init_params(k3, text_cfg, dtype=jnp.float32), text_cfg,
    )
    import numpy as np

    rng = np.random.default_rng(0)
    # absurd batch at max duration must clamp under the 3 GiB budget
    req = GenerationRequest(duration_s=600.0, batch_size=64,
                            style_token_ids=rng.integers(0, 128, (1, 6)),
                            seeds=list(range(64)))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # planner decision happens before any device work; to keep this test
        # cheap, only check the clamp fires (generation of 600 s on CPU is slow,
        # so run with duration clamped after the planner by intercepting)
        try:
            import unittest.mock as mock

            with mock.patch.object(engine, "build_condition", side_effect=RuntimeError("stop")):
                engine.generate(req)
        except RuntimeError:
            pass
    assert any("planner clamped" in str(x.message) for x in w)


def test_hbm_cap_simulation(monkeypatch):
    """ACESTEP_TPU_MAX_HBM_GB simulates small-chip tiers (MAX_CUDA_VRAM analog)."""
    from acestep_tpu.memory_planner import detect_hbm_bytes, plan_request

    monkeypatch.setenv("ACESTEP_TPU_MAX_HBM_GB", "8")
    assert detect_hbm_bytes() == 8 * GiB
    cfg, vae = DiTConfig(), VAEConfig()
    plan = plan_request(cfg, vae, 2 * GiB, batch=8, frames=15000)   # auto-detect
    assert plan.max_batch < 8
    monkeypatch.setenv("ACESTEP_TPU_MAX_HBM_GB", "95")
    assert detect_hbm_bytes() == 95 * GiB
