"""LM pipeline tests: prompt format, CoT parsing, two-phase generation (mock tok)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu import lm_pipeline as lp
from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen


class TestPrompts:
    def test_cot_prompt_format(self):
        p = lp.build_formatted_prompt("calm piano", "hello world")
        assert p.startswith("<|im_start|>system\n# Instruction\n")
        assert "# Caption\ncalm piano\n\n# Lyric\nhello world\n" in p
        assert p.endswith("<|im_start|>assistant\n")

    def test_negative_cot_prompt_drops_caption(self):
        p = lp.build_formatted_prompt("calm piano", "la la", is_negative_prompt=True)
        assert "# Caption" not in p
        assert "# Lyric\nla la\n" in p

    def test_negative_with_real_negative_prompt(self):
        p = lp.build_formatted_prompt(
            "calm piano", "la", is_negative_prompt=True, negative_prompt="noisy drums")
        assert "# Caption\nnoisy drums" in p

    def test_codes_prompt_has_cot_in_assistant_turn(self):
        cot = "<think>\nbpm: 120\n</think>"
        p = lp.build_formatted_prompt_with_cot("c", "l", cot)
        assert p.endswith("</think>\n")
        assert "<|im_start|>assistant\n<think>" in p
        # the assistant turn must stay OPEN (no <|im_end|> after the CoT)
        assert not p.rstrip().endswith("<|im_end|>")


class TestParse:
    def test_full_cot(self):
        text = (
            "<think>\nbpm: 73\ncaption: A calm piano melody\nduration: 273\n"
            "genres: Chinese folk\nkeyscale: G major\nlanguage: en\n"
            "timesignature: 4\n</think>\n\n"
            "<|audio_code_56535|><|audio_code_62918|>"
        )
        md, codes = lp.parse_lm_output(text)
        assert md["bpm"] == 73 and md["duration"] == 273
        assert md["caption"] == "A calm piano melody"
        assert md["keyscale"] == "G major" and md["timesignature"] == "4"
        assert codes == "<|audio_code_56535|><|audio_code_62918|>"

    def test_multiline_caption(self):
        text = "<think>\ncaption: first line\n  second line\nbpm: 99\n</think>"
        md, _ = lp.parse_lm_output(text)
        assert md["caption"] == "first line second line"
        assert md["bpm"] == 99

    def test_no_think_tags(self):
        text = "bpm: 120\ncaption: test\n<|audio_code_5|>"
        md, codes = lp.parse_lm_output(text)
        assert md["bpm"] == 120
        assert codes == "<|audio_code_5|>"

    def test_codes_roundtrip(self):
        idx = np.asarray([0, 5, 63999], np.int32)
        s = lp.indices_to_codes(idx)
        np.testing.assert_array_equal(lp.codes_to_indices(s), idx)

    def test_metadata_to_cot_roundtrip(self):
        md = {"bpm": 100, "caption": "x", "duration": 30}
        cot = lp.metadata_to_cot(md)
        parsed, _ = lp.parse_lm_output(cot)
        assert parsed == md


# ---------------------------------------------------------------------------
# two-phase generation with a tiny model + mock tokenizer
# ---------------------------------------------------------------------------

class MockTokenizer:
    """Byte-level mock: each char -> ord(c) % 200; special ids above 200."""

    eos_token_id = 250
    think_end_id = 251
    audio_code_base_id = 300

    def encode(self, text):
        return [ord(c) % 200 for c in text][:64]

    def decode(self, ids):
        out = []
        for i in ids:
            if i == self.think_end_id:
                out.append("</think>")
            elif i == self.eos_token_id:
                pass
            elif i >= self.audio_code_base_id:
                out.append(f"<|audio_code_{i - self.audio_code_base_id}|>")
            else:
                out.append(chr(int(i) % 94 + 32))
        return "".join(out)


TINY = QwenConfig(
    vocab_size=1024, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128, head_dim=16,
)


@pytest.fixture(scope="module")
def pipe():
    params = qwen.init_params(jax.random.key(0), TINY, dtype=jnp.float32, scale=0.1)
    import acestep_tpu.lm_pipeline as mod

    # shrink the codebook so allowed_range fits the tiny vocab
    return lp.LMPipeline(params, TINY, MockTokenizer())


def test_two_phase_generation(pipe, monkeypatch):
    monkeypatch.setattr(lp, "AUDIO_CODEBOOK_SIZE", 500)
    res = pipe.generate_with_stop_condition(
        "calm piano", "la la la", target_duration_s=2.0,
        max_cot_tokens=8, seed=1,
    )
    # 2 s at 5 Hz -> exactly 10 codes
    assert len(res.code_indices) == 10
    assert (res.code_indices >= 0).all() and (res.code_indices < 500).all()
    assert res.cot_text.startswith("<think>")
    assert "lm_phase1_time_cost" in res.time_costs
    assert "lm_phase2_time_cost" in res.time_costs


def test_no_thinking_uses_user_metadata(pipe, monkeypatch):
    monkeypatch.setattr(lp, "AUDIO_CODEBOOK_SIZE", 500)
    res = pipe.generate_with_stop_condition(
        "c", "l", target_duration_s=2.0, thinking=False,
        user_metadata={"bpm": 100, "duration": 2},
    )
    assert res.metadata["bpm"] == 100
    assert len(res.code_indices) == 10
    assert "lm_phase1_time_cost" not in res.time_costs


def test_batch_candidates_and_prefix_cache(pipe, monkeypatch):
    monkeypatch.setattr(lp, "AUDIO_CODEBOOK_SIZE", 500)
    pipe.prefix_cache.hits = pipe.prefix_cache.misses = 0
    res = pipe.generate_with_stop_condition(
        "warm synth", "ah ah", target_duration_s=2.0,
        max_cot_tokens=8, seed=3, batch_size=3, chunk_size=2,
    )
    assert res.candidates is not None and len(res.candidates) == 3
    for c in res.candidates:
        assert len(c) == 10            # duration-constrained EOS per candidate
    np.testing.assert_array_equal(res.candidates[0], res.code_indices)
    # phase 2 re-uses the phase-1 system+user prompt prefill
    assert pipe.prefix_cache.hits >= 1


def test_mixed_durations_share_code_bucket(pipe, monkeypatch):
    """5 s and 8 s both bucket to 64 code tokens -> shared compiled scan; each
    still stops at its own forced-EOS count (traced operand)."""
    monkeypatch.setattr(lp, "AUDIO_CODEBOOK_SIZE", 500)
    assert lp.code_bucket(int(5 * 5) + 2) == lp.code_bucket(int(8 * 5) + 2) == 64
    r5 = pipe.generate_with_stop_condition("a", "b", target_duration_s=5.0,
                                           thinking=False, user_metadata={"duration": 5})
    r8 = pipe.generate_with_stop_condition("a", "b", target_duration_s=8.0,
                                           thinking=False, user_metadata={"duration": 8})
    assert len(r5.code_indices) == 25
    assert len(r8.code_indices) == 40


def test_constrained_cot_fsm(pipe, monkeypatch):
    monkeypatch.setattr(lp, "AUDIO_CODEBOOK_SIZE", 500)
    res = pipe.generate_with_stop_condition(
        "fsm test", "", target_duration_s=2.0,
        max_cot_tokens=64, seed=5, constrained_cot=True,
        user_metadata={"bpm": 120},
    )
    # FSM injects user metadata as forced text and keeps field order
    assert res.cot_text.startswith("<think>")
    assert "bpm: 120" in res.cot_text
    assert len(res.code_indices) == 10
