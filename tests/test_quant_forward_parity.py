"""Single-forward quantization parity on a mid-size DiT.

The E2E eval runs 8 chaotic Euler steps where weight noise compounds; the
per-forward cosine here is the clean quality signal (compare_dit.py style).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.quant import quantize_tree

MID = DiTConfig(
    hidden_size=256, intermediate_size=512, num_hidden_layers=4,
    num_attention_heads=4, num_key_value_heads=2, head_dim=64,
    in_channels=48, audio_acoustic_hidden_dim=16, patch_size=2,
    sliding_window=16, text_hidden_dim=64,
    num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
    timbre_hidden_dim=16,
)


def _cos(a, b):
    a = a.ravel().astype(np.float64)
    b = b.ravel().astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def setup():
    params = dit.init_params(jax.random.key(0), MID, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.standard_normal((1, 32, 16)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 32, 32)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((1, 8, 256)), jnp.float32)
    t = jnp.asarray([0.7], jnp.float32)
    ref = np.asarray(dit.forward(params, MID, hs, t, t, enc, ctx), dtype=np.float32)
    return params, (hs, ctx, enc, t), ref


POLICY = lambda p, a: getattr(a, "ndim", 0) == 2 and p.endswith("kernel") and a.shape[0] % 32 == 0


@pytest.mark.parametrize("fmt,min_cos", [("q8_0", 0.999), ("q4_0", 0.97), ("q4_k", 0.97)])
def test_forward_cosine(setup, fmt, min_cos):
    params, (hs, ctx, enc, t), ref = setup
    qp = quantize_tree(params, fmt, policy=POLICY)
    out = np.asarray(dit.forward(qp, MID, hs, t, t, enc, ctx), dtype=np.float32)
    c = _cos(ref, out)
    assert c > min_cos, f"{fmt}: cosine {c}"


def test_q4k_beats_q4_0(setup):
    params, (hs, ctx, enc, t), ref = setup
    c = {}
    for fmt in ("q4_0", "q4_k"):
        qp = quantize_tree(params, fmt, policy=POLICY)
        out = np.asarray(dit.forward(qp, MID, hs, t, t, enc, ctx), dtype=np.float32)
        c[fmt] = _cos(ref, out)
    assert c["q4_k"] >= c["q4_0"] - 0.002   # asymmetric format at least matches
