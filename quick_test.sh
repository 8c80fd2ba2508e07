#!/usr/bin/env bash
# Smoke test (reference quick_test.* analog): environment check, a fast test
# subset, and a tiny end-to-end generate on CPU with random weights.
# Usage: ./quick_test.sh [--full]   (--full runs the whole pytest suite)
set -euo pipefail
cd "$(dirname "$0")"

echo "== environment =="
python tools/check_env.py

echo "== unit tests (fast subset) =="
if [[ "${1:-}" == "--full" ]]; then
  python -m pytest tests/ -x -q
else
  python -m pytest tests/test_quant.py tests/test_sampler.py tests/test_pipeline.py -x -q
fi

echo "== tiny end-to-end generate (CPU, random weights) =="
python - <<'EOF'
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
from acestep_tpu.pipeline import GenerationRequest, build_random_engine

engine = build_random_engine(
    jax.random.key(0),
    quant="q8_0",
    dit_cfg=DiTConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=8, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=1, num_timbre_encoder_hidden_layers=1,
        timbre_hidden_dim=8,
    ),
    vae_cfg=VAEConfig(
        audio_channels=2, encoder_hidden_size=16, decoder_channels=8,
        decoder_input_channels=8, downsampling_ratios=(2, 4, 4),
        channel_multiples=(1, 2, 4),
    ),
    text_cfg=QwenConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
        head_dim=16,
    ),
)
rng = np.random.default_rng(0)
res = engine.generate(
    GenerationRequest(
        duration_s=2.0,
        style_token_ids=rng.integers(0, 255, (1, 8)),
        lyric_token_ids=rng.integers(0, 255, (1, 16)),
        seeds=[1],
    )
)
audio = res.audio[0]
assert np.isfinite(audio).all(), "non-finite audio"
n = res.audio_lengths[0]
# engine contract: valid samples = clamp(duration_s, MIN..MAX) * 25 Hz * hop(32)
from acestep_tpu.pipeline import MIN_DURATION_S
expect = int(round(max(2.0, MIN_DURATION_S) * 25)) * 32
assert n == expect, f"output length {n} != {expect}"
print(f"OK: generated {n} valid samples ({audio.shape[0]} padded), "
      f"peak {abs(audio).max():.3f}")
EOF

echo "quick_test: ALL OK"
