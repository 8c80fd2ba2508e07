"""On-device DFA-constrained CoT decode (compiled FSM) vs the host FSM.

The compiled DFA (constrained.compile_dfa) must (a) reproduce the host FSM's
per-state masks exactly along any valid token walk, and (b) drive
generate_with_fsm_device to the same greedy token sequence as the host-stepped
generate_with_fsm.  Reference analog: constrained_logits_processor.py:548-648
per-state static mask tables.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu import constrained as C
from acestep_tpu.config import QwenConfig


def _vocab():
    """Synthetic tokenizer vocab: field-key pieces, digits, trie fragments,
    free-text pieces, newlines — enough to express every FSM field."""
    pieces = ["<pad>", "", "\n", "\n\n"]
    # forced-key fragments (varied granularities incl. boundary-spanning)
    for f in C.FIELD_ORDER:
        pieces += [f, f + ":", ": ", ":", " ", f[:2], f[2:]]
    pieces += ["</think>", "</", "think", ">", "\ngenres", "\ngenres: "]
    # digits: single + multi
    pieces += [str(d) for d in range(10)]
    pieces += ["12", "30", "60", "99", "100", "120", "240", "300", "600", "45"]
    # keyscale / language / genre fragments
    pieces += ["C", "C#", "D", "Eb", "G", "A", "B", "#", " major",
               " minor", "maj", "or", "min", "ajor", "inor",
               "en", "zh", "ja", "fr", "de",
               "ko", "po", "rock", "jazz", "ja-no", "soul", "neo-",
               "neo-soul", "hip", " hop", "lo", "-fi", "lo-fi"]
    # every lowercase letter, so trie walks can always finish a value
    pieces += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    # caption free text
    pieces += ["hello", " world", "warm", " night", " groove", "tex", "t",
               "caption-ish", "!", "?", ",", ".", " a", " the"]
    # dedupe preserving order
    seen, out = set(), []
    for p in pieces:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


VOCAB = _vocab()


@pytest.mark.parametrize("user_metadata", [
    {},
    {"bpm": 120, "duration": 60},
    {"caption": "fixed words", "keyscale": "C major"},
])
def test_dfa_masks_match_host_fsm_along_walks(user_metadata):
    """Random valid walks: at every step the DFA state's mask (incl. the
    caption dynamic rule) equals the host FSM's allowed() exactly."""
    rng = np.random.default_rng(0)
    dfa = C.compile_dfa(VOCAB, user_metadata=user_metadata)
    for walk in range(8):
        fsm = C.MetadataFSM(user_metadata=user_metadata)
        state, used = dfa.start_state, 0
        for step in range(260):
            if fsm.done:
                assert state == dfa.done_state
                break
            host = fsm.allowed(VOCAB)
            dev = dfa.host_mask(state, used)
            np.testing.assert_array_equal(
                dev, host,
                err_msg=f"walk {walk} step {step} state sig diverges "
                        f"(field {fsm.current_field}, mode {fsm.mode})")
            choices = host.nonzero()[0]
            if not choices.size:
                # dead state (forced-text overshoot fed garbage downstream):
                # both machines agree it's dead and stop — like the host loop
                assert not dev.any()
                break
            tok = int(rng.choice(choices))
            # advance both machines (host_step mirrors the device body)
            fsm.step(VOCAB[tok])
            state, used = dfa.host_step(state, used, tok)
        else:
            pytest.fail("walk did not terminate in 260 steps")


def test_dfa_caption_budget_matches_host():
    """Tiny caption budget: the device-side char register must cut off free
    text exactly where the host FSM does."""
    cfg = C.FSMConfig(max_caption_chars=8)
    dfa = C.compile_dfa(VOCAB, cfg=cfg)
    fsm = C.MetadataFSM(cfg)
    # drive both to the caption value state deterministically (greedy first
    # allowed token that is not a newline, then fill the budget)
    state, used = dfa.start_state, 0
    guard = 0
    while not (fsm.current_field == "caption" and fsm.mode == "value"
               and fsm.forced_text is None):
        host = fsm.allowed(VOCAB)
        tok = int(host.nonzero()[0][0])
        fsm.step(VOCAB[tok])
        state, used = dfa.host_step(state, used, tok)
        guard += 1
        assert guard < 200
    assert dfa.is_caption[state]
    assert used == len(fsm.value_text)   # carried-in chars counted
    # consume budget with "hello" (5 chars)
    fsm.step("hello")
    state, used = dfa.host_step(state, used, VOCAB.index("hello"))
    host = fsm.allowed(VOCAB)
    dev = dfa.host_mask(state, used)
    np.testing.assert_array_equal(dev, host)
    # " world" (6 chars) must be masked in both; "tex" (3) allowed in both
    assert not host[VOCAB.index(" world")]
    assert host[VOCAB.index("tex")]


class _Tok:
    eos_token_id = 0

    def encode(self, text):
        return [1 + (b % 60) for b in text.encode()][:32]

    def decode(self, ids):
        return "".join(VOCAB[i] for i in ids if 0 <= i < len(VOCAB))


def _lm():
    from acestep_tpu.models import qwen

    cfg = QwenConfig(
        vocab_size=max(160, len(VOCAB)), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        head_dim=16)
    params = qwen.init_params(jax.random.key(3), cfg, dtype=jnp.float32,
                              scale=0.2)
    return params, cfg


@pytest.mark.parametrize("user_metadata", [{}, {"bpm": 95}])
def test_device_generation_matches_host_greedy(user_metadata):
    """Greedy device DFA decode == greedy host-stepped FSM decode, token for
    token, on a random tiny LM."""
    from acestep_tpu.serving import lm as lm_serving

    params, cfg = _lm()
    prompt = [5, 9, 2, 14]
    fcfg = C.FSMConfig(max_caption_chars=24)   # keep greedy runs short
    fsm = C.MetadataFSM(fcfg, user_metadata=user_metadata)
    host_ids, host_text = lm_serving.generate_with_fsm(
        params, cfg, prompt, fsm, VOCAB, jax.random.key(0),
        temperature=0.0, max_new_tokens=192)
    assert fsm.done, "host FSM did not finish"

    dfa = C.compile_dfa(VOCAB, cfg=fcfg, user_metadata=user_metadata)
    dev_ids, dev_text = lm_serving.generate_with_fsm_device(
        params, cfg, prompt, dfa, VOCAB, jax.random.key(0),
        temperature=0.0, max_new_tokens=192)
    assert dev_text == host_text
    assert dev_ids == host_ids


def test_device_generation_sampled_is_valid():
    """Sampled (T>0) device decode produces FSM-valid text ending the block."""
    from acestep_tpu.serving import lm as lm_serving

    params, cfg = _lm()
    fcfg = C.FSMConfig(max_caption_chars=24)
    dfa = C.compile_dfa(VOCAB, cfg=fcfg)
    ids, text = lm_serving.generate_with_fsm_device(
        params, cfg, [5, 9, 2, 14], dfa, VOCAB, jax.random.key(7),
        temperature=0.9, max_new_tokens=192)
    assert text.endswith("</think>")
    # replay through the host FSM: every token must be legal
    fsm = C.MetadataFSM(fcfg)
    for t in ids:
        assert fsm.allowed(VOCAB)[t], f"illegal sampled token {t}={VOCAB[t]!r}"
        fsm.step(VOCAB[t])
    assert fsm.done


def test_pipeline_uses_device_fsm(monkeypatch):
    """LMPipeline CoT routes through the device DFA by default and falls back
    to the host path when disabled — identical output either way (greedy)."""
    import acestep_tpu.lm_pipeline as lp

    params, cfg = _lm()

    class PTok(_Tok):
        think_end_id = 1
        audio_code_base_id = 100

        def vocab_strs(self):
            return VOCAB

    pipe = lp.LMPipeline(dict(params), cfg, PTok())
    out_dev = pipe._run_cot_fsm("warm", "la", {}, jax.random.key(1),
                                temperature=0.0, max_cot_tokens=512)
    monkeypatch.setenv("ACESTEP_TPU_DEVICE_FSM", "0")
    out_host = pipe._run_cot_fsm("warm", "la", {}, jax.random.key(1),
                                 temperature=0.0, max_cot_tokens=512)
    assert out_dev == out_host
