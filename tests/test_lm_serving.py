"""LM serving tests: int8 KV-cache decode vs full forward, constrained decoding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen
from acestep_tpu.serving import SamplingParams, generate
from acestep_tpu.serving import kv_cache as kvc
from acestep_tpu.serving import lm

TINY = QwenConfig(
    vocab_size=128, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    head_dim=16,
)


@pytest.fixture(scope="module")
def params():
    return qwen.init_params(jax.random.key(0), TINY, dtype=jnp.float32, scale=0.1)


class TestKVCache:
    def test_quantize_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 16)), jnp.float32)
        q, s = kvc.quantize_kv(x)
        back = kvc.dequantize_kv(q, s, jnp.float32)
        err = np.abs(np.asarray(back) - np.asarray(x)).max()
        amax = float(jnp.abs(x).max())
        assert err <= amax / 127.0 + 1e-6

    def test_append_positions(self):
        cache = kvc.init_cache(1, 2, 2, 8, 4)
        cache = kvc.KVCache(cache.k, cache.v, cache.k_scale, cache.v_scale,
                            jnp.asarray([2, 0], jnp.int32))
        k = jnp.ones((2, 2, 1, 4), jnp.float32)
        cache = kvc.append_token(cache, 0, k, k)
        kq = np.asarray(cache.k[0])
        assert kq[0, 0, 2].any() and not kq[0, 0, 0].any()   # seq0 wrote at pos 2
        assert kq[1, 0, 0].any() and not kq[1, 0, 1].any()   # seq1 wrote at pos 0


class TestDecodeParity:
    def test_cached_greedy_matches_full_forward(self, params):
        """Greedy decode via the int8 KV cache must produce the same tokens as
        re-running the full causal forward each step (the correctness anchor for
        cache layout, per-seq RoPE positions, and masking)."""
        rng = np.random.default_rng(3)
        b, t0, n_new = 2, 7, 6
        prompt = rng.integers(0, TINY.vocab_size, (b, t0)).astype(np.int32)
        lengths = jnp.asarray([t0, t0 - 2], jnp.int32)
        # right-pad seq1's prompt: positions beyond length are padding
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new)
        tokens, n_gen = generate(
            params, TINY, jnp.asarray(prompt), lengths, jax.random.key(0), sp
        )
        tokens = np.asarray(tokens)

        # reference: grow the (unpadded) sequence and run the full model
        for bi in range(b):
            seq = list(prompt[bi, : int(lengths[bi])])
            for step in range(n_new):
                ids = jnp.asarray([seq], jnp.int32)
                h = qwen.forward(params, TINY, ids)
                logits = qwen.lm_logits(params, TINY, h)[0, -1]
                nxt = int(jnp.argmax(logits))
                assert nxt == tokens[bi, step], (
                    f"seq {bi} step {step}: cache={tokens[bi, step]} full={nxt}"
                )
                seq.append(nxt)


class TestConstrained:
    def test_allowed_range_and_forced_eos(self, params):
        lo, hi, eos = 10, 50, 3
        sp = SamplingParams(
            temperature=0.8, max_new_tokens=12, allowed_range=(lo, hi),
            eos_token=eos, min_tokens=8, forced_eos_at=8,
        )
        prompt = jnp.asarray([[1, 2, 4, 5]], jnp.int32)
        tokens, n_gen = generate(
            params, TINY, prompt, jnp.asarray([4], jnp.int32), jax.random.key(1), sp
        )
        tokens = np.asarray(tokens)[0]
        n = int(n_gen[0])
        assert n == 9                       # 8 codes then forced EOS
        assert tokens[8] == eos
        body = tokens[:8]
        assert ((body >= lo) & (body < hi)).all()   # EOS blocked, range enforced

    def test_stop_token(self, params):
        # temperature 0 on random weights: find what greedy emits, then stop on it
        sp0 = SamplingParams(temperature=0.0, max_new_tokens=4)
        prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
        toks, _ = generate(params, TINY, prompt, jnp.asarray([3], jnp.int32),
                           jax.random.key(0), sp0)
        second = int(np.asarray(toks)[0, 1])
        sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop_tokens=(second,))
        toks2, n_gen = generate(params, TINY, prompt, jnp.asarray([3], jnp.int32),
                                jax.random.key(0), sp)
        assert int(n_gen[0]) == 2
        assert int(np.asarray(toks2)[0, 1]) == second
        assert (np.asarray(toks2)[0, 2:] == -1).all()

    def test_cfg_runs_and_differs(self, params):
        prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        uncond = jnp.asarray([[9, 9]], jnp.int32)
        sp_plain = SamplingParams(temperature=0.0, max_new_tokens=5)
        sp_cfg = SamplingParams(temperature=0.0, max_new_tokens=5, cfg_scale=3.0)
        a, _ = generate(params, TINY, prompt, jnp.asarray([4], jnp.int32),
                        jax.random.key(0), sp_plain)
        c, _ = generate(params, TINY, prompt, jnp.asarray([4], jnp.int32),
                        jax.random.key(0), sp_cfg, uncond, jnp.asarray([2], jnp.int32))
        assert np.asarray(c).shape == (1, 5)
        # guidance changes the trajectory for random weights (almost surely)
        assert not np.array_equal(np.asarray(a), np.asarray(c))


class TestFSMGeneration:
    def test_constrained_cot_generation(self, params):
        from acestep_tpu.constrained import FIELD_RANGES, MetadataFSM
        from acestep_tpu.serving.lm import generate_with_fsm
        from acestep_tpu import lm_pipeline as lp

        # vocab: tiny model has 128 ids; map each to a character piece
        vocab_strs = []
        for i in range(TINY.vocab_size):
            if i == 100:
                vocab_strs.append("\n")
            elif i == 101:
                vocab_strs.append("major")
            elif i == 102:
                vocab_strs.append("minor")
            elif i == 103:
                vocab_strs.append("</think>")
            else:
                vocab_strs.append(chr(32 + i % 94))
        fsm = MetadataFSM(user_metadata={"bpm": 120})
        ids, text = generate_with_fsm(
            params, TINY, [1, 2, 3], fsm, vocab_strs, jax.random.key(0),
            temperature=0.8, max_new_tokens=300,
        )
        assert fsm.done
        assert "bpm: 120\n" in text
        md, _ = lp.parse_lm_output("<think>\n" + text.replace("</think>", "\n</think>"))
        for f in ("timesignature", "duration"):
            lo, hi = FIELD_RANGES[f]
            assert lo <= int(md[f]) <= hi


class TestPrefixCache:
    def test_extend_prefill_matches_full_prefill(self, params):
        """prefill(prefix) + extend_prefill(suffix) must reproduce the full
        prefill's cache and continue decoding identically."""
        from acestep_tpu.serving.lm import extend_prefill

        rng = np.random.default_rng(5)
        full_ids = rng.integers(0, TINY.vocab_size, (1, 12)).astype(np.int32)
        max_len = 24

        # full prefill
        c_full = kvc.init_cache(TINY.num_hidden_layers, 1, TINY.num_key_value_heads,
                                max_len, TINY.head_dim)
        lg_full, c_full = lm.prefill(params, TINY, jnp.asarray(full_ids),
                                     jnp.asarray([12], jnp.int32), c_full)

        # split prefill
        c_split = kvc.init_cache(TINY.num_hidden_layers, 1, TINY.num_key_value_heads,
                                 max_len, TINY.head_dim)
        _, c_split = lm.prefill(params, TINY, jnp.asarray(full_ids[:, :7]),
                                jnp.asarray([7], jnp.int32), c_split)
        lg_split, c_split = extend_prefill(params, TINY, c_split,
                                           jnp.asarray(full_ids[:, 7:]),
                                           jnp.asarray([7], jnp.int32))

        np.testing.assert_allclose(np.asarray(lg_full), np.asarray(lg_split),
                                   atol=2e-2, rtol=2e-2)
        assert int(c_split.length[0]) == 12
        # greedy continuation must agree
        t_full = int(jnp.argmax(lg_full))
        t_split = int(jnp.argmax(lg_split))
        assert t_full == t_split
        lf, cf = lm.decode_step(params, TINY, c_full, jnp.asarray([t_full], jnp.int32))
        ls, cs = lm.decode_step(params, TINY, c_split, jnp.asarray([t_split], jnp.int32))
        assert int(jnp.argmax(lf)) == int(jnp.argmax(ls))

    def test_prefix_cache_lookup(self):
        from acestep_tpu.serving.lm import PrefixCache

        pc = PrefixCache(max_entries=2)
        c = kvc.init_cache(1, 1, 2, 8, 4)
        pc.insert([1, 2, 3], c, jnp.zeros((1, 8)))
        hit = pc.lookup([1, 2, 3, 4, 5])
        assert hit is not None and hit[0] == 3
        assert pc.lookup([9, 9]) is None
        pc.insert([7], c, jnp.zeros((1, 8)))
        pc.insert([8], c, jnp.zeros((1, 8)))   # evicts oldest
        assert pc.lookup([1, 2, 3]) is None    # evicted


class TestReducedCodesHead:
    def test_reduced_matches_full_greedy(self, params, monkeypatch):
        """Greedy codes-phase decode with the column-sliced head must produce
        exactly the tokens of the full-vocab path (same matmul columns, same
        constraint semantics; serving/lm.py _slice_head_cols)."""
        rng = np.random.default_rng(11)
        prompt = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 6)), jnp.int32)
        lengths = jnp.asarray([6, 6], jnp.int32)
        sp = SamplingParams(
            temperature=0.0, max_new_tokens=10, allowed_range=(16, 80),
            eos_token=5, min_tokens=3, forced_eos_at=8,
        )
        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("ACESTEP_TPU_REDUCED_CODES_HEAD", flag)
            jax.clear_caches()
            toks, n = generate(params, TINY, prompt, lengths, jax.random.key(2), sp)
            outs[flag] = (np.asarray(toks), np.asarray(n))
        np.testing.assert_array_equal(outs["1"][0], outs["0"][0])
        np.testing.assert_array_equal(outs["1"][1], outs["0"][1])
        # constraint semantics hold
        toks, n = outs["1"]
        for row, nr in zip(toks, n):
            valid = row[:nr]
            assert valid[-1] == 5 or nr == sp.max_new_tokens
            assert all((16 <= t < 80) or t == 5 for t in valid)

    def test_ensure_quantized_head_tied(self):
        """Quantized-layer tied models get a q8_0 lm_head copy; decode stays
        within quant tolerance of the tied bf16 projection."""
        from acestep_tpu.quant import QuantTensor, quantize_tree_jax

        cfg = QwenConfig(
            vocab_size=512, hidden_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=512,
            head_dim=64,
        )
        p = qwen.init_params(jax.random.key(1), cfg, dtype=jnp.float32, scale=0.1)
        pq = qwen.stack_params(quantize_tree_jax(p, "q8_0"))  # quantize pre-stack
        pq = lm.ensure_quantized_head(pq)
        assert isinstance(pq["lm_head"]["kernel"], QuantTensor)
        assert pq["lm_head"]["kernel"].shape == (256, 2048)  # vocab padded to 2048
        # unquantized params: no head added
        assert lm.ensure_quantized_head(p).get("lm_head") is None

        # logits through the quantized head track the tied projection
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, 256)), jnp.float32)
        from acestep_tpu.ops import linear

        tied = np.asarray(qwen.lm_logits(p, cfg, x))[0, 0]
        qhead = np.asarray(linear(x, pq["lm_head"]["kernel"]))[0, 0][: cfg.vocab_size]
        cos = np.dot(tied, qhead) / (np.linalg.norm(tied) * np.linalg.norm(qhead) + 1e-9)
        assert cos > 0.999

    def test_slice_head_cols_quant(self):
        """Column slicing a QuantTensor head dequantizes to exactly the sliced
        columns of the full dequantized matrix (+ EOS col + zero pad)."""
        from acestep_tpu.quant import dequantize
        from acestep_tpu.quant.jax_quant import quantize_jax

        w = jnp.asarray(np.random.default_rng(5).standard_normal((256, 384)), jnp.float32)
        qt = quantize_jax(w, "q8_0")
        red, n_range, n_valid = lm._slice_head_cols(qt, 32, 160, eos=300)
        assert (n_range, n_valid) == (128, 129)
        full_d = np.asarray(dequantize(qt, jnp.float32))
        red_d = np.asarray(dequantize(red, jnp.float32))
        np.testing.assert_array_equal(red_d[:, :128], full_d[:, 32:160])
        np.testing.assert_array_equal(red_d[:, 128], full_d[:, 300])
        assert not red_d[:, 129:].any()


class TestFusedServingParams:
    def test_fused_matches_unfused(self, params):
        """q||k||v and gate||up fusion is numerically exact: greedy generate
        must produce identical tokens (serving/lm.py fuse_serving_params)."""
        stacked = qwen.stack_params({k: v for k, v in params.items()})
        fused = lm.fuse_serving_params(stacked)
        assert "qkv_proj" in fused["layers"] and "q_proj" not in fused["layers"]
        rng = np.random.default_rng(7)
        prompt = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 9)), jnp.int32)
        lengths = jnp.asarray([9, 7], jnp.int32)
        sp = SamplingParams(temperature=0.0, max_new_tokens=8)
        t0, n0 = generate(stacked, TINY, prompt, lengths, jax.random.key(0), sp)
        t1, n1 = generate(fused, TINY, prompt, lengths, jax.random.key(0), sp)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))

    def test_fused_quant_concat_exact(self):
        """QuantTensor concat along N dequantizes to the column concat."""
        from acestep_tpu.quant import dequantize
        from acestep_tpu.quant.jax_quant import quantize_jax

        rng = np.random.default_rng(2)
        a = quantize_jax(jnp.asarray(rng.standard_normal((256, 128)), jnp.float32), "q4_k")
        c = quantize_jax(jnp.asarray(rng.standard_normal((256, 64)), jnp.float32), "q4_k")
        cat = lm._concat_kernels([a, c])
        assert cat.shape == (256, 192)
        da = np.asarray(dequantize(a, jnp.float32))
        dc = np.asarray(dequantize(c, jnp.float32))
        dcat = np.asarray(dequantize(cat, jnp.float32))
        np.testing.assert_array_equal(dcat, np.concatenate([da, dc], axis=1))
