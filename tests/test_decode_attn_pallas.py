"""Pallas decode-attention kernel vs the XLA int8-KV reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.ops.pallas.decode_attn import decode_attention_int8_stacked
from acestep_tpu.serving import kv_cache as kvc
from acestep_tpu.serving.lm import NEG_INF, attention_int8_self


def _setup(b, hq, hkv, t_max, d, n_l, lengths, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((n_l, b, hkv, t_max, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n_l, b, hkv, t_max, d)), jnp.float32)
    kq, ks = kvc.quantize_kv(k)
    vq, vs = kvc.quantize_kv(v)
    k_self = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.bfloat16)
    v_self = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.bfloat16)
    lengths = jnp.asarray(lengths, jnp.int32)
    return q, kq, ks, vq, vs, lengths, k_self, v_self


def _xla_ref(q, kq, ks, vq, vs, lengths, li, k_self, v_self):
    t_max = kq.shape[3]
    pos = jnp.arange(t_max)
    bias = jnp.where(pos[None, :] < lengths[:, None], 0.0,
                     NEG_INF).astype(jnp.float32)[:, None, :]
    out = attention_int8_self(q, kq[li], ks[li], vq[li], vs[li], bias,
                              k_self, v_self)
    # the XLA path rounds to q.dtype (bf16) on return; compare there
    return out[:, :, 0, :]


@pytest.mark.parametrize("b,lengths", [
    (1, [1]),            # only the self term
    (1, [7]),            # partial first block
    (1, [128]),          # exact block boundary
    (1, [200]),          # spans two blocks
    (4, [1, 100, 128, 256]),   # mixed lengths incl. full cache
])
def test_matches_xla_reference(b, lengths):
    hq, hkv, d, t_max, n_l = 8, 4, 128, 256, 3
    q, kq, ks, vq, vs, lens, k_self, v_self = _setup(b, hq, hkv, t_max, d, n_l, lengths)
    for li in range(n_l):
        got = decode_attention_int8_stacked(
            q[:, :, 0, :], kq, ks, vq, vs, lens, jnp.int32(li),
            k_self, v_self, interpret=True).astype(jnp.bfloat16)
        ref = _xla_ref(q, kq, ks, vq, vs, lens, li, k_self, v_self)
        np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                                   np.asarray(ref, dtype=np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_gqa_group_of_four():
    b, hq, hkv, d, t_max, n_l = 2, 16, 4, 128, 512, 2
    q, kq, ks, vq, vs, lens, k_self, v_self = _setup(
        b, hq, hkv, t_max, d, n_l, [300, 511], seed=3)
    got = decode_attention_int8_stacked(
        q[:, :, 0, :], kq, ks, vq, vs, lens, jnp.int32(1),
        k_self, v_self, interpret=True).astype(jnp.bfloat16)
    ref = _xla_ref(q, kq, ks, vq, vs, lens, 1, k_self, v_self)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)


def test_tile_unfriendly_shapes_return_none():
    q, kq, ks, vq, vs, lens, k_self, v_self = _setup(
        1, 8, 4, 96, 128, 1, [5])      # t_max=96 not divisible by 128
    assert decode_attention_int8_stacked(
        q[:, :, 0, :], kq, ks, vq, vs, lens, jnp.int32(0),
        k_self, v_self, interpret=True) is None


class TestDecodeStepIntegration:
    """decode_step with ACESTEP_TPU_DECODE_ATTN=pallas (interpret off-TPU)
    matches the XLA attention path at kernel-friendly shapes."""

    CFG = None

    @classmethod
    def setup_class(cls):
        from acestep_tpu.config import QwenConfig

        cls.CFG = QwenConfig(
            vocab_size=64, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
            head_dim=128,       # kernel needs D % 128 == 0
        )

    def _decode(self, monkeypatch, mode, b=2):
        from acestep_tpu.models import qwen
        from acestep_tpu.serving import lm

        monkeypatch.setenv("ACESTEP_TPU_DECODE_ATTN", mode)
        params = qwen.init_params(jax.random.key(1), self.CFG,
                                  dtype=jnp.float32, scale=0.1)
        params = qwen.stack_params(params)
        cache = kvc.init_cache(2, b, 2, 128, 128)
        rng = np.random.default_rng(5)
        k0 = jnp.asarray(rng.standard_normal((b, 2, 5, 128)), jnp.float32)
        cache = kvc.write_prompt(cache, 0, k0, k0, jnp.asarray([5, 3][:b], jnp.int32))
        cache = kvc.write_prompt(cache, 1, k0 * 0.5, k0 * 0.5, cache.length)
        toks = jnp.asarray([3, 7][:b], jnp.int32)
        logits, cache2 = lm.decode_step(params, self.CFG, cache, toks)
        return np.asarray(logits), np.asarray(cache2.k)

    def test_pallas_matches_xla(self, monkeypatch):
        lx, kx = self._decode(monkeypatch, "xla")
        lp, kp = self._decode(monkeypatch, "pallas")
        # int8 writes may differ by 1 ulp once layer inputs diverge at bf16
        assert np.abs(kx.astype(np.int32) - kp.astype(np.int32)).max() <= 1
        np.testing.assert_allclose(lp, lx, rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# fused-prologue kernel (norm + rope + quantize + attention)
# ---------------------------------------------------------------------------

def _xla_fused_ref(q_raw, k_raw, v_raw, qn, kn, cos, sin,
                   kq, ks, vq, vs, lengths, li, eps=1e-6):
    """The exact XLA op chain the fused kernel replaces
    (serving/lm.py decode scan_body)."""
    from acestep_tpu.ops import apply_rope, rms_norm

    b, hq, d = q_raw.shape
    hkv = k_raw.shape[1]
    # [B, H, D] -> [B, H, 1, D] like the scan body's transposed layout
    q = rms_norm(q_raw[:, None], qn, eps).transpose(0, 2, 1, 3)
    k = rms_norm(k_raw[:, None], kn, eps).transpose(0, 2, 1, 3)
    v = v_raw[:, None].transpose(0, 2, 1, 3)
    q, k = apply_rope(q, k, cos[:, None, None], sin[:, None, None])
    k_self, v_self = k[:, :, 0, :], v[:, :, 0, :]
    kq_new, ks_new = kvc.quantize_kv(k_self)
    vq_new, vs_new = kvc.quantize_kv(v_self)
    t_max = kq.shape[3]
    pos = jnp.arange(t_max)
    bias = jnp.where(pos[None, :] < lengths[:, None], 0.0,
                     NEG_INF).astype(jnp.float32)[:, None, :]
    out = attention_int8_self(q, kq[li], ks[li], vq[li], vs[li], bias,
                              k_self, v_self)
    return out[:, :, 0, :], kq_new, ks_new, vq_new, vs_new


@pytest.mark.parametrize("b,lengths", [
    (1, [1]),
    (1, [200]),
    (3, [1, 100, 256]),
])
def test_fused_matches_xla_chain(b, lengths):
    from acestep_tpu.ops.pallas.decode_attn import decode_attention_fused_stacked

    hq, hkv, d, t_max, n_l = 8, 4, 128, 256, 2
    rng = np.random.default_rng(11)
    q_raw = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    k_raw = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.bfloat16)
    v_raw = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.bfloat16)
    qn = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    # rope terms at each sequence's position
    pos = jnp.asarray(lengths, jnp.float32)
    inv = 1.0 / (1e6 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    emb = jnp.concatenate([pos[:, None] * inv[None], pos[:, None] * inv[None]], -1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    kc = jnp.asarray(rng.standard_normal((n_l, b, hkv, t_max, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((n_l, b, hkv, t_max, d)), jnp.float32)
    kq, ks = kvc.quantize_kv(kc)
    vq, vs = kvc.quantize_kv(vc)
    lens = jnp.asarray(lengths, jnp.int32)

    for li in range(n_l):
        got = decode_attention_fused_stacked(
            q_raw, k_raw, v_raw, qn, kn, cos, sin,
            kq, ks, vq, vs, lens, jnp.int32(li), interpret=True)
        assert got is not None
        out, kq_new, ks_new, vq_new, vs_new = got
        ref_out, rkq, rks, rvq, rvs = _xla_fused_ref(
            q_raw, k_raw, v_raw, qn, kn, cos, sin, kq, ks, vq, vs, lens, li)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref_out, np.float32),
                                   rtol=3e-2, atol=3e-2)
        # quantized KV for the cache write: scales close, int8 within 1 LSB
        np.testing.assert_allclose(np.asarray(ks_new), np.asarray(rks),
                                   rtol=2e-2, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vs_new), np.asarray(rvs),
                                   rtol=2e-2, atol=1e-4)
        assert np.abs(np.asarray(kq_new, np.int32) -
                      np.asarray(rkq, np.int32)).max() <= 2
        assert np.abs(np.asarray(vq_new, np.int32) -
                      np.asarray(rvq, np.int32)).max() <= 2


def test_fused_decode_generate_parity(monkeypatch):
    """End-to-end decode scan parity: ACESTEP_TPU_DECODE_ATTN=fused vs the
    default XLA path on a tiny stacked model (greedy, f32 weights)."""
    import jax

    from acestep_tpu.config import QwenConfig
    from acestep_tpu.models import qwen
    from acestep_tpu.serving import lm as lm_serving

    cfg = QwenConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=128, max_position_embeddings=512, rope_theta=1e6,
    )
    params = qwen.stack_params(
        qwen.init_params(jax.random.key(0), cfg, dtype=jnp.float32))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 16)), jnp.int32)
    lengths = jnp.full((1,), 16, jnp.int32)
    sp = lm_serving.SamplingParams(max_new_tokens=8, temperature=0.0)

    monkeypatch.setenv("ACESTEP_TPU_DECODE_ATTN", "xla")
    base, n_base = lm_serving.generate(params, cfg, ids, lengths,
                                       jax.random.key(1), sp)
    jax.clear_caches()
    monkeypatch.setenv("ACESTEP_TPU_DECODE_ATTN", "fused")
    fused, n_fused = lm_serving.generate(params, cfg, ids, lengths,
                                         jax.random.key(1), sp)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fused))
