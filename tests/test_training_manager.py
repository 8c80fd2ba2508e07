"""TrainingManager default factory: converted checkpoint + dataset -> LoRA train."""

import dataclasses
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu import loader
from acestep_tpu.pipeline import AceStepEngine
from acestep_tpu.serving.training_manager import TrainingManager
from acestep_tpu.training.data import build_dataset
from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT
import acestep_tpu.models.dit as dit_mod
import acestep_tpu.models.vae as vae_mod
import acestep_tpu.models.qwen as qwen_mod


def test_default_factory_trains_and_exports(tmp_path):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    base = dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32)
    engine = AceStepEngine(
        base, TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    loader.save_params(str(ckpt / "dit"), base, {"component": "dit"})
    with open(ckpt / "config.json", "w") as f:
        json.dump(dataclasses.asdict(TINY_DIT), f)

    rng = np.random.default_rng(0)
    hop = TINY_VAE.hop_length
    samples = [
        {"audio": rng.standard_normal((hop * 8, 2)).astype(np.float32) * 0.1,
         "style_token_ids": rng.integers(0, 250, (1, 6))}
        for _ in range(2)
    ]
    ds_dir = build_dataset(engine, samples, str(tmp_path / "ds"))

    mgr = TrainingManager()
    out = mgr.start({
        "dataset_dir": ds_dir,
        "checkpoint_dir": str(ckpt),
        "output_dir": str(tmp_path / "out"),
        "mode": "lora",
        "lora_rank": 2,
        "total_steps": 4,          # short job: warmup must auto-clamp below this
        "batch_size": 1,
        "checkpoint_every": 0,
    })
    assert out["state"] == "starting"
    t0 = time.time()
    while time.time() - t0 < 120:
        st = mgr.status()
        if st["state"] in ("completed", "failed"):
            break
        time.sleep(0.2)
    assert st["state"] == "completed", st
    assert st["step"] == 4
    assert np.isfinite(st["loss"])
    assert os.path.exists(st["export_path"] + ".safetensors")

    # the exported adapter round-trips through the inference-time manager
    from acestep_tpu.lora_runtime import LoRARuntime

    rt = LoRARuntime(engine, base)
    rt.register_from_dir("trained", st["export_path"], alpha=8.0)
    rt.activate("trained", scale=1.0)   # must not raise on disk-loaded trees
    rt.deactivate("trained")
