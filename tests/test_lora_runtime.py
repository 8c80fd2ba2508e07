"""Inference-time LoRA manager: activate/scale/unload on a live engine."""

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu.lora_runtime import LoRARuntime
from acestep_tpu.pipeline import AceStepEngine, GenerationRequest
from acestep_tpu.training.lora import init_lora
from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT
import acestep_tpu.models.dit as dit_mod
import acestep_tpu.models.vae as vae_mod
import acestep_tpu.models.qwen as qwen_mod


def test_lora_runtime_lifecycle():
    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    base = dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32)
    engine = AceStepEngine(
        base, TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )
    rt = LoRARuntime(engine, base)
    rng = np.random.default_rng(0)
    req = GenerationRequest(
        duration_s=10.0, style_token_ids=rng.integers(0, 256, (1, 6)), seeds=[1])

    base_out = engine.generate(req).latents

    lora = init_lora(k4, base, rank=4)
    # make the adapter a non-no-op (b starts at zero)
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.05 if getattr(x, "ndim", 0) == 2 else x, lora)
    rt.register("style_a", lora, alpha=8.0)
    assert rt.list_adapters()["style_a"]["active"] is False

    rt.activate("style_a")
    with_lora = engine.generate(req).latents
    assert np.abs(with_lora - base_out).max() > 1e-5    # adapter changes output

    rt.set_scale("style_a", 0.25)
    scaled = engine.generate(req).latents
    assert np.abs(scaled - with_lora).max() > 1e-6      # scale matters
    assert np.abs(scaled - base_out).max() > 1e-6

    rt.deactivate("style_a")
    restored = engine.generate(req).latents
    np.testing.assert_array_equal(restored, base_out)   # exact restore

    rt.unregister("style_a")
    assert rt.list_adapters() == {}
