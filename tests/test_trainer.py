"""Trainer loop, checkpoint/resume, dataset pipeline tests (tiny models, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
from acestep_tpu.models import dit
from acestep_tpu.training.data import PreprocessedDataset, build_dataset
from acestep_tpu.training.trainer import TrainConfig, Trainer

TINY = DiTConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=1,
    num_attention_heads=2, num_key_value_heads=2, head_dim=16,
    in_channels=12, audio_acoustic_hidden_dim=4, patch_size=2,
    sliding_window=4, text_hidden_dim=16,
    num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
    timbre_hidden_dim=4,
)


def _batches(n, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield {
            "latents": jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32),
            "context_latents": jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32),
            "encoder_hidden_states": jnp.asarray(rng.standard_normal((2, 3, 32)), jnp.float32),
            "loss_mask": jnp.ones((2, 8), jnp.float32),
        }


def test_trainer_runs_and_checkpoints(tmp_path):
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    tc = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=20, lora_rank=2,
                     checkpoint_every=4, log_every=100)
    tr = Trainer(params, TINY, tc, str(tmp_path))
    out = tr.train(_batches(8), max_steps=8, log_fn=lambda s: None)
    assert out["steps"] == 8
    assert np.isfinite(out["final_loss"])
    ckpts = [d for d in tmp_path.iterdir() if d.name.startswith("ckpt_") and d.is_dir()]
    assert len(ckpts) == 2      # steps 4 and 8


def test_resume_restores_state(tmp_path):
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    tc = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=20, lora_rank=2,
                     checkpoint_every=5, log_every=100)
    tr = Trainer(params, TINY, tc, str(tmp_path))
    tr.train(_batches(5), max_steps=5, log_fn=lambda s: None)
    snap = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(tr.trainable)]

    tr2 = Trainer(params, TINY, tc, str(tmp_path))
    assert tr2.resume()
    assert tr2.step == 5
    for a, b in zip(snap, jax.tree_util.tree_leaves(tr2.trainable)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_export_and_merge(tmp_path):
    from acestep_tpu import loader

    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    tc = TrainConfig(lr=5e-3, warmup_steps=1, total_steps=10, lora_rank=2,
                     checkpoint_every=0, log_every=100)
    tr = Trainer(params, TINY, tc, str(tmp_path))
    tr.train(_batches(4), max_steps=4, log_fn=lambda s: None)
    path = tr.export("adapter")
    loaded = loader.load_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(tr.trainable), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    merged = tr.merged_params()
    assert merged["layers"][0]["self_attn"]["q_proj"]["kernel"].shape == \
        params["layers"][0]["self_attn"]["q_proj"]["kernel"].shape


def test_dataset_build_and_stream(tmp_path):
    from acestep_tpu.models import qwen as qwen_mod
    from acestep_tpu.models import vae as vae_mod
    from acestep_tpu.pipeline import AceStepEngine

    vae_cfg = VAEConfig(audio_channels=2, encoder_hidden_size=16, decoder_channels=8,
                        decoder_input_channels=8, downsampling_ratios=(2, 4, 4),
                        channel_multiples=(1, 2, 4))
    text_cfg = QwenConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=2, num_key_value_heads=2,
                          intermediate_size=64, head_dim=16)
    dit_cfg = DiTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2, head_dim=16,
        in_channels=12, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=4, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
        timbre_hidden_dim=8,
    )
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    engine = AceStepEngine(
        dit.init_params(k1, dit_cfg, dtype=jnp.float32), dit_cfg,
        vae_mod.init_params(k2, vae_cfg), vae_cfg,
        qwen_mod.init_params(k3, text_cfg, dtype=jnp.float32), text_cfg,
    )
    rng = np.random.default_rng(0)
    hop = vae_cfg.hop_length
    samples = [
        {"audio": rng.standard_normal((12 * hop, 2)).astype(np.float32) * 0.1,
         "style_token_ids": rng.integers(0, 128, (1, 5))}
        for _ in range(3)
    ]
    out = build_dataset(engine, samples, str(tmp_path / "ds"))
    ds = PreprocessedDataset(out)
    assert len(ds) == 3
    batch = next(ds.batches(batch_size=2, epochs=1))
    assert batch["latents"].shape[0] == 2
    assert batch["latents"].shape[2] == 8
    assert batch["encoder_hidden_states"].shape[2] == dit_cfg.hidden_size


def test_metrics_logger(tmp_path):
    import json as _json
    from acestep_tpu.training.trainer import MetricsLogger

    path = str(tmp_path / "events.jsonl")
    m = MetricsLogger(path)
    for i in range(5):
        m.scalar("train/loss", 1.0 / (i + 1), i)
    m.flush()
    events = [_json.loads(l) for l in open(path)]
    assert len(events) == 5
    assert events[0]["tag"] == "train/loss" and events[4]["step"] == 4
    assert events[2]["value"] == pytest.approx(1 / 3)


def test_trainer_lokr_mode(tmp_path):
    """mode=lokr drives the kron-factored adapter through the same Trainer
    surface as lora (train -> loss falls or stays finite, merged_params
    differs from base, export round-trips)."""
    from acestep_tpu import loader

    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    tc = TrainConfig(lr=5e-3, warmup_steps=1, total_steps=10, lora_rank=2,
                     lokr_factor=4, mode="lokr", checkpoint_every=0,
                     log_every=100)
    tr = Trainer(params, TINY, tc, str(tmp_path))
    out = tr.train(_batches(6), max_steps=6, log_fn=lambda m: None)
    assert out["steps"] == 6
    assert np.isfinite(out["final_loss"])
    merged = tr.merged_params()
    base_leaf = jax.tree_util.tree_leaves(params)[0]
    # at least one targeted kernel moved
    deltas = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(merged),
                        jax.tree_util.tree_leaves(params))
        if getattr(a, "shape", None) == getattr(b, "shape", None)
    ]
    assert max(deltas) > 0
    path = tr.export("lokr_adapter")
    restored = loader.load_params(path)
    assert restored                       # non-empty adapter tree round-trips


def test_trainer_bad_mode_raises(tmp_path):
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    tc = TrainConfig(mode="dora")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dora"):
        Trainer(params, TINY, tc, str(tmp_path))
