"""Engine-under-mesh parity for configs[4]-class workloads (cover / repaint /
base-model CFG) on the virtual 8-device CPU mesh.

Round-2 gaps closed here: the cover/repaint tasks through the TP sampler and
the base-model CFG sampler under the mesh (pipeline.py previously ran CFG
replicated-only).  Reference analogs: handler.py:2102-2208 cover/repaint prep,
nano-vllm scheduler CFG-pair co-scheduling (scheduler.py:47-156).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu import pipeline
from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
from acestep_tpu.parallel import make_mesh
from acestep_tpu.pipeline import AceStepEngine, GenerationRequest

# mesh-compatible tiny shapes: tp=4 must divide nh/nkv
MESH_DIT = DiTConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=8, num_key_value_heads=4, head_dim=16,
    in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
    sliding_window=8, text_hidden_dim=32,
    num_lyric_encoder_hidden_layers=1, num_timbre_encoder_hidden_layers=1,
    timbre_hidden_dim=8,
)
MESH_VAE = VAEConfig(
    audio_channels=2, encoder_hidden_size=16, decoder_channels=8,
    decoder_input_channels=8, downsampling_ratios=(2, 4, 4),
    channel_multiples=(1, 2, 4),
)
MESH_TEXT = QwenConfig(
    vocab_size=256, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
    head_dim=16,
)


def _params():
    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.vae as vae_mod
    import acestep_tpu.models.qwen as qwen_mod

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    return (dit_mod.init_params(k1, MESH_DIT, dtype=jnp.float32),
            vae_mod.init_params(k2, MESH_VAE),
            qwen_mod.init_params(k3, MESH_TEXT, dtype=jnp.float32))


@pytest.fixture(scope="module")
def engines():
    dit_p, vae_p, text_p = _params()
    single = AceStepEngine(dit_p, MESH_DIT, vae_p, MESH_VAE, text_p, MESH_TEXT)
    meshed = AceStepEngine(dit_p, MESH_DIT, vae_p, MESH_VAE, text_p, MESH_TEXT,
                           mesh=make_mesh(8, dp=2, tp=4))
    return single, meshed


def _assert_latent_parity(ref, out, tol=2e-3):
    err = np.abs(out.latents - ref.latents).max()
    scale = np.abs(ref.latents).max() + 1e-6
    assert err / scale < tol, f"mesh diverges: rel={err / scale:.2e}"
    assert np.isfinite(out.audio).all()


class TestMeshWorkloads:
    def test_cover_strength_switch(self, engines):
        """Cover with mid-schedule condition switch through the TP sampler."""
        single, meshed = engines
        rng = np.random.default_rng(7)
        src = rng.standard_normal((1, 250, MESH_DIT.audio_acoustic_hidden_dim)).astype(np.float32)
        refer = rng.standard_normal((1, 1, 20, MESH_DIT.timbre_hidden_dim)).astype(np.float32)
        kw = dict(duration_s=10.0, style_token_ids=rng.integers(0, 256, (1, 6)),
                  task="cover", src_latents=src, refer_latents=refer,
                  audio_cover_strength=0.5, seeds=[3])
        ref = single.generate(GenerationRequest(**kw))
        out = meshed.generate(GenerationRequest(**kw))
        _assert_latent_parity(ref, out)

    def test_repaint_span(self, engines):
        single, meshed = engines
        rng = np.random.default_rng(2)
        t_valid = pipeline.frames_for_duration(10.0)
        kw = dict(duration_s=10.0,
                  style_token_ids=rng.integers(0, 256, (1, 6)),
                  lyric_token_ids=rng.integers(0, 256, (1, 9)),
                  task="repaint",
                  src_latents=rng.standard_normal(
                      (1, t_valid, MESH_DIT.audio_acoustic_hidden_dim)).astype(np.float32),
                  repaint_start_s=2.0, repaint_end_s=6.0, seeds=[4])
        ref = single.generate(GenerationRequest(**kw))
        out = meshed.generate(GenerationRequest(**kw))
        _assert_latent_parity(ref, out)

    def test_base_model_cfg(self, engines):
        """Base-model CFG sampler under the mesh (TP co-batched 2B forward)."""
        single, meshed = engines
        rng = np.random.default_rng(9)
        kw = dict(duration_s=10.0, seeds=[5],
                  style_token_ids=rng.integers(0, 256, (1, 6)),
                  guidance_scale=3.0, infer_steps=6)
        ref = single.generate(GenerationRequest(**kw))
        out = meshed.generate(GenerationRequest(**kw))
        assert meshed._tp_cfg_sampler is not None
        _assert_latent_parity(ref, out)

    def test_base_model_cfg_batch_sharded(self, engines):
        """Real negative prompt + dp-sharded batch (b=2 over dp=2) through the
        TP CFG sampler."""
        single, meshed = engines
        rng = np.random.default_rng(10)
        kw = dict(duration_s=10.0, seeds=[6, 7], batch_size=2,
                  style_token_ids=np.tile(rng.integers(0, 256, (1, 6)), (2, 1)),
                  uncond_style_token_ids=np.tile(rng.integers(0, 256, (1, 6)), (2, 1)),
                  guidance_scale=5.0, infer_steps=6)
        ref = single.generate(GenerationRequest(**kw))
        out = meshed.generate(GenerationRequest(**kw))
        _assert_latent_parity(ref, out, tol=5e-3)

    def test_base_model_adg_mesh_smoke(self, engines):
        """ADG under the mesh: finite and actually different from plain CFG.

        No tight parity assert: ADG's nc/nd rescale amplifies benign psum
        reduction-order noise ~17x per step on random weights (measured: even
        tp=2 vs tp=4 disagree by 2.5e-2 after 4 steps), so bitwise-style
        parity is ill-conditioned here.  The guidance math itself is the SAME
        code on both paths (sampler.sample_latents_cfg; axis_name only adds
        the psum), and per-forward TP parity is covered by
        test_tp_sharded_forward_matches_single_device."""
        _, meshed = engines
        rng = np.random.default_rng(11)
        kw = dict(duration_s=10.0, seeds=[8],
                  style_token_ids=rng.integers(0, 256, (1, 6)),
                  guidance_scale=5.0, infer_steps=6)
        plain = meshed.generate(GenerationRequest(**kw))
        adg = meshed.generate(GenerationRequest(use_adg=True, **kw))
        assert np.isfinite(adg.latents).all()
        assert np.abs(adg.latents - plain.latents).max() > 1e-5
