"""Numerical parity harness for the Qwen3 stack vs HuggingFace transformers.

TPU-native analog of acestep_ggml/tools/compare_text_encoder.py: identical random
weights into both implementations, identical tokens, compare hidden states
(per-token cosine >= 0.999 was the reference gate; we hold a much tighter bound
in f32).
"""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen

SMALL = QwenConfig(
    vocab_size=512,
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    head_dim=16,
    rope_theta=1e6,
)


def _to_hf(params, cfg):
    """Copy our pytree into a transformers Qwen3Model with the same config."""
    from transformers.models.qwen3 import Qwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3Model

    hf_cfg = Qwen3Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        intermediate_size=cfg.intermediate_size,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        attention_bias=False,
        use_cache=False,
        attn_implementation="eager",
    )
    model = Qwen3Model(hf_cfg).eval().to(torch.float32)

    def t(x):  # our [K, N] kernel -> torch Linear weight [N, K]
        return torch.from_numpy(np.asarray(x, dtype=np.float32).T.copy())

    def v(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())

    sd = {"embed_tokens.weight": v(params["embed_tokens"]), "norm.weight": v(params["norm"])}
    for i, p in enumerate(params["layers"]):
        pre = f"layers.{i}."
        sd[pre + "input_layernorm.weight"] = v(p["input_norm"])
        sd[pre + "post_attention_layernorm.weight"] = v(p["post_norm"])
        sd[pre + "self_attn.q_proj.weight"] = t(p["q_proj"]["kernel"])
        sd[pre + "self_attn.k_proj.weight"] = t(p["k_proj"]["kernel"])
        sd[pre + "self_attn.v_proj.weight"] = t(p["v_proj"]["kernel"])
        sd[pre + "self_attn.o_proj.weight"] = t(p["o_proj"]["kernel"])
        sd[pre + "self_attn.q_norm.weight"] = v(p["q_norm"])
        sd[pre + "self_attn.k_norm.weight"] = v(p["k_norm"])
        sd[pre + "mlp.gate_proj.weight"] = t(p["gate_proj"]["kernel"])
        sd[pre + "mlp.up_proj.weight"] = t(p["up_proj"]["kernel"])
        sd[pre + "mlp.down_proj.weight"] = t(p["down_proj"]["kernel"])
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # rotary tables are buffers, allowed to be "missing"
    assert all("rotary" in m or "inv_freq" in m for m in missing), missing
    return model


@pytest.fixture(scope="module")
def pair():
    # richer-than-default init so mismatches can't hide in tiny magnitudes
    params = qwen.init_params(jax.random.key(7), SMALL, dtype=jnp.float32, scale=0.15)
    hf = _to_hf(params, SMALL)
    return params, hf


def _cosine(a, b):
    a = a.reshape(-1)
    b = b.reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_causal_forward_parity(pair):
    params, hf = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, SMALL.vocab_size, (2, 17))
    ours = np.asarray(qwen.forward(params, SMALL, jnp.asarray(ids, jnp.int32)))
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    assert _cosine(ours, theirs) > 0.99999
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


def test_attention_mask_parity(pair):
    params, hf = pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, SMALL.vocab_size, (2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[0, 8:] = 0
    mask[1, 5:] = 0
    ours = np.asarray(
        qwen.forward(params, SMALL, jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    )
    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    # compare valid positions only (masked positions are don't-care)
    for bi in range(2):
        n = int(mask[bi].sum())
        assert _cosine(ours[bi, :n], theirs[bi, :n]) > 0.99999


def test_embeddings_only(pair):
    params, _ = pair
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    emb = qwen.embeddings_only(params, ids)
    np.testing.assert_array_equal(
        np.asarray(emb[0, 1]), np.asarray(params["embed_tokens"][2])
    )


def test_quantized_forward_close(pair):
    """Q8_0 text-encoder output must stay cosine-close to fp — the reference gate
    (compare_text_encoder.py) requires per-token cosine >= 0.999 for Q8."""
    params, _ = pair
    from acestep_tpu.quant import quantize_tree

    # drop the min-size gate so the tiny test mats actually quantize
    from acestep_tpu.quant import convert as qc

    policy = lambda path, a: getattr(a, "ndim", 0) == 2 and path.rsplit("/", 1)[-1] == "kernel" and "embed" not in path
    pq = quantize_tree(params, "q8_0", policy=policy)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, SMALL.vocab_size, (1, 33)), jnp.int32)
    fp = np.asarray(qwen.forward(params, SMALL, ids), dtype=np.float32)
    q8 = np.asarray(qwen.forward(pq, SMALL, ids), dtype=np.float32)
    for t in range(fp.shape[1]):
        assert _cosine(fp[0, t], q8[0, t]) > 0.999
