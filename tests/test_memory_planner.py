"""HBM admission-control planner tests."""

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.memory_planner import GiB, Plan, dit_activation_bytes, plan_request


def test_batch_clamped_under_small_hbm():
    cfg = DiTConfig()
    vae = VAEConfig()
    params = 2 * GiB
    plan = plan_request(cfg, vae, params, batch=8, frames=15000, hbm_bytes=16 * GiB)
    assert plan.max_batch < 8              # 600s at batch 8 cannot fit in 16G
    assert plan.max_batch >= 1


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
