"""LM tensor-parallel serving parity (parallel/lm_tp.py) on the virtual mesh.

The reference TP-shards the Qwen LM via nano-vllm's Column/QKV/RowParallel
linears + sharded vocab head (linear.py:54-152, embed_head.py); here the same
Megatron layout runs per-shard under shard_map.  Every test asserts TOKEN
parity against the single-device serving path on the 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen
from acestep_tpu.quant import quantize_tree
from acestep_tpu.parallel.lm_tp import LMTPContext
from acestep_tpu.serving import SamplingParams, generate
from acestep_tpu.serving import kv_cache as kvc
from acestep_tpu.serving import lm as lm_serving

TINY = QwenConfig(
    vocab_size=160, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=8, num_key_value_heads=8, intermediate_size=128,
    head_dim=16,
)

# quantized shapes: hidden % 256 == 0 (quantized head), per-rank K multiples
# of 32 at tp=8 for the row-parallel o/down kernels
QUANT = QwenConfig(
    vocab_size=320, hidden_size=256, num_hidden_layers=2,
    num_attention_heads=8, num_key_value_heads=8, intermediate_size=512,
    head_dim=32,
)


def _mesh(dp: int, tp: int) -> Mesh:
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


def _single_params(cfg, key=0, quant=None):
    p = qwen.init_params(jax.random.key(key), cfg, dtype=jnp.float32, scale=0.1)
    if quant:
        policy = lambda path, a: (  # noqa: E731
            getattr(a, "ndim", 0) == 2 and path.endswith("kernel")
            and a.shape[0] % 256 == 0)
        p = quantize_tree(p, quant, policy=policy)
    return p


def _serving_params(cfg, key=0, quant=None):
    """Standard single-device serving prep (stack + head + plain fusion)."""
    p = qwen.stack_params(_single_params(cfg, key, quant))
    p = lm_serving.ensure_quantized_head(p)
    return lm_serving.fuse_serving_params(p)


def _tp_ctx(cfg, mesh, key=0, quant=None):
    p = qwen.stack_params(_single_params(cfg, key, quant))
    p = lm_serving.ensure_quantized_head(p)
    return LMTPContext(p, cfg, mesh)


PROMPT = np.asarray([[3, 14, 15, 92, 6, 53], [5, 8, 9, 7, 0, 0]], np.int32)
LENGTHS = np.asarray([6, 4], np.int32)


class TestGenerateParity:
    @pytest.mark.parametrize("dp,tp", [(1, 8), (2, 4), (1, 2)])
    def test_greedy_f32(self, dp, tp):
        sp = SamplingParams(temperature=0.0, max_new_tokens=8)
        ref_p = _serving_params(TINY)
        ref, ref_n = generate(ref_p, TINY, jnp.asarray(PROMPT),
                              jnp.asarray(LENGTHS), jax.random.key(0), sp)
        ctx = _tp_ctx(TINY, _mesh(dp, tp))
        got, got_n = ctx.generate(jnp.asarray(PROMPT), jnp.asarray(LENGTHS),
                                  jax.random.key(0), sp)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        np.testing.assert_array_equal(np.asarray(ref_n), np.asarray(got_n))

    def test_greedy_q8_sharded_head(self):
        """Quantized weights + quantized vocab-sharded head (all_gather logits)."""
        sp = SamplingParams(temperature=0.0, max_new_tokens=8)
        ref_p = _serving_params(QUANT, quant="q8_0")
        assert ref_p.get("lm_head") is not None     # head actually quantized
        ref, _ = generate(ref_p, QUANT, jnp.asarray(PROMPT),
                          jnp.asarray(LENGTHS), jax.random.key(0), sp)
        ctx = _tp_ctx(QUANT, _mesh(1, 8), quant="q8_0")
        got, _ = ctx.generate(jnp.asarray(PROMPT), jnp.asarray(LENGTHS),
                              jax.random.key(0), sp)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_cfg_pairing(self):
        sp = SamplingParams(temperature=0.0, max_new_tokens=6, cfg_scale=2.0)
        uncond = np.asarray([[7, 2, 1, 0, 0, 0], [9, 4, 0, 0, 0, 0]], np.int32)
        ulens = np.asarray([3, 2], np.int32)
        kw = dict(uncond_prompt_ids=jnp.asarray(uncond),
                  uncond_prompt_lengths=jnp.asarray(ulens))
        ref_p = _serving_params(TINY)
        ref, _ = generate(ref_p, TINY, jnp.asarray(PROMPT), jnp.asarray(LENGTHS),
                          jax.random.key(1), sp, **kw)
        ctx = _tp_ctx(TINY, _mesh(2, 4))
        got, _ = ctx.generate(jnp.asarray(PROMPT), jnp.asarray(LENGTHS),
                              jax.random.key(1), sp, **kw)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestCodesPhase:
    def test_reduced_head_constrained(self):
        """allowed_range codes decode with the PRE-SHARDED reduced head +
        traced per-item min/forced EOS, vs the single-device reduced head."""
        lo, hi, eos = 200, 280, 3
        sp = SamplingParams(
            temperature=0.0, max_new_tokens=12, allowed_range=(lo, hi),
            eos_token=eos,
        )
        min_arr = jnp.asarray([8, 5], jnp.int32)
        forced_arr = jnp.asarray([8, 5], jnp.int32)
        ref_p = _serving_params(QUANT, quant="q8_0")
        ref, ref_n = generate(ref_p, QUANT, jnp.asarray(PROMPT),
                              jnp.asarray(LENGTHS), jax.random.key(2), sp,
                              min_tokens_arr=min_arr, forced_eos_arr=forced_arr)
        ctx = _tp_ctx(QUANT, _mesh(1, 8), quant="q8_0")
        assert ctx._head_red(sp) is not None        # reduced head is in play
        got, got_n = ctx.generate(jnp.asarray(PROMPT), jnp.asarray(LENGTHS),
                                  jax.random.key(2), sp,
                                  min_tokens_arr=min_arr, forced_eos_arr=forced_arr)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        got, got_n = np.asarray(got), np.asarray(got_n)
        assert int(got_n[0]) == 9 and int(got_n[1]) == 6   # forced EOS per item
        assert got[0, 8] == eos and got[1, 5] == eos
        body = got[0, :8]
        assert ((body >= lo) & (body < hi)).all()


class TestPrefixFlow:
    def test_prefill_extend_broadcast_decode(self):
        """The full prefix-cache flow with the sharded global KV cache crossing
        every shard_map boundary: prefill -> grow -> extend -> broadcast -> scan."""
        cfg = TINY
        ids = [3, 14, 15, 92, 6, 53, 5, 8]
        suffix = [9, 7, 1]
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        total = kvc.round_len(len(ids) + len(suffix) + sp.max_new_tokens + 2)

        def run(prefill, extend, decode, nkv):
            cache = kvc.init_cache(cfg.num_hidden_layers, 1, nkv, 128, cfg.head_dim)
            logits, cache = prefill(
                jnp.asarray([ids], jnp.int32), jnp.asarray([len(ids)], jnp.int32),
                cache)
            cache = kvc.grow_cache(cache, total)
            logits, cache = extend(
                cache, jnp.asarray([suffix], jnp.int32),
                jnp.asarray([len(ids)], jnp.int32),
                jnp.asarray([len(suffix)], jnp.int32))
            cache2 = kvc.broadcast_cache(cache, 2)
            logits2 = jnp.broadcast_to(logits, (2, logits.shape[-1]))
            return decode(cache2, logits2, jax.random.key(3), sp)

        ref_p = _serving_params(cfg)
        ref, ref_n = run(
            lambda i, l, c: lm_serving._prefill_jit(ref_p, cfg, i, l, c),
            lambda c, s, st, sl: lm_serving.extend_prefill_jit(ref_p, cfg, c, s, st, sl),
            lambda c, lg, k, s: lm_serving.decode_from_state(ref_p, cfg, c, lg, k, s),
            cfg.num_key_value_heads)

        ctx = _tp_ctx(cfg, _mesh(1, 8))
        got, got_n = run(ctx.prefill, ctx.extend_prefill,
                         lambda c, lg, k, s: ctx.decode_from_state(c, lg, k, s),
                         cfg.num_key_value_heads)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        np.testing.assert_array_equal(np.asarray(ref_n), np.asarray(got_n))


class TestPipelineTP:
    def test_two_phase_parity(self, monkeypatch):
        """LMPipeline(mesh=...) end-to-end two-phase flow matches the
        single-device pipeline token-for-token at temperature 0."""
        import acestep_tpu.lm_pipeline as lp
        from tests.test_lm_pipeline import MockTokenizer

        monkeypatch.setattr(lp, "AUDIO_CODEBOOK_SIZE", 500)
        cfg = QwenConfig(
            vocab_size=1024, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=8,
            intermediate_size=128, head_dim=16,
        )
        tok = MockTokenizer()
        params = _single_params(cfg, key=5)
        kw = dict(target_duration_s=2.0, temperature=0.0, seed=11,
                  thinking=True, max_cot_tokens=8)
        ref = lp.LMPipeline(dict(params), cfg, tok).generate_with_stop_condition(
            "calm piano", "la la", **kw)
        got = lp.LMPipeline(dict(params), cfg, tok,
                            mesh=_mesh(2, 4)).generate_with_stop_condition(
            "calm piano", "la la", **kw)
        assert ref.cot_text == got.cot_text
        np.testing.assert_array_equal(ref.code_indices, got.code_indices)


class TestValidation:
    def test_bad_tp_raises(self):
        cfg = QwenConfig(
            vocab_size=160, hidden_size=64, num_hidden_layers=1,
            num_attention_heads=6, num_key_value_heads=3,
            intermediate_size=96, head_dim=16,
        )
        p = qwen.stack_params(_single_params(cfg))
        with pytest.raises(ValueError):
            LMTPContext(p, cfg, _mesh(1, 4))
