"""Metadata FSM constrained-decoding tests."""

import numpy as np
import pytest

from acestep_tpu import lm_pipeline as lp
from acestep_tpu.constrained import (
    FIELD_RANGES,
    KEYSCALES,
    FSMConfig,
    MetadataFSM,
    fsm_generate_text,
)

# character-level vocab plus a few multi-char tokens (realistic BPE-ish)
VOCAB = [chr(c) for c in range(32, 127)] + ["\n", "major", "minor", "12", "en",
                                            "bpm: ", "</think>", "ja", "zz"]


def _greedy_fsm(user_metadata=None, seed=0, prefer=None):
    """Drive the FSM with a random-but-valid sampler."""
    rng = np.random.default_rng(seed)
    fsm = MetadataFSM(user_metadata=user_metadata)

    def sample(mask):
        ids = np.nonzero(mask)[0]
        if prefer is not None:
            for p in prefer:
                if p in [VOCAB[i] for i in ids]:
                    return VOCAB.index(p)
        return int(rng.choice(ids))

    return fsm_generate_text(fsm, sample, VOCAB, max_tokens=400), fsm


def test_output_parses_and_respects_order():
    text, fsm = _greedy_fsm(seed=3)
    assert fsm.done
    full = "<think>\n" + text.replace("</think>", "\n</think>")
    md, _ = lp.parse_lm_output(full)
    for f in ("bpm", "timesignature", "duration"):
        lo, hi = FIELD_RANGES[f]
        assert lo <= int(md[f]) <= hi, (f, md)
    assert md["keyscale"] in KEYSCALES
    # fields appear in canonical order
    idx = [text.index(f + ": ") for f in ("bpm", "timesignature", "keyscale",
                                          "duration", "language", "caption", "genres")]
    assert idx == sorted(idx)
    assert text.endswith("</think>")


def test_user_metadata_injected_verbatim():
    text, fsm = _greedy_fsm(user_metadata={"bpm": 128, "keyscale": "F# minor"})
    assert "bpm: 128\n" in text
    assert "keyscale: F# minor\n" in text


def test_numeric_range_enforced():
    fsm = MetadataFSM()
    # consume forced "bpm: "
    fsm.step("bpm: ")
    assert fsm.allowed_piece("2")
    fsm.step("2")
    fsm.step("9")
    fsm.step("9")
    assert not fsm.allowed_piece("9")      # 2999 would exceed 300
    assert fsm.allowed_piece("\n")         # 299 is valid


def test_keyscale_trie():
    fsm = MetadataFSM()
    for f in ("bpm", "timesignature"):
        fsm.step(f + ": ")
        fsm.step("4")
        fsm.step("\n")
    fsm.step("keyscale: ")
    assert fsm.allowed_piece("F")
    fsm.step("F")
    assert fsm.allowed_piece("#")
    assert not fsm.allowed_piece("z")
    fsm.step("# ")
    assert fsm.allowed_piece("minor")
    assert not fsm.allowed_piece("\n")     # incomplete value can't end


def test_multi_char_tokens_cross_boundaries():
    fsm = MetadataFSM()
    assert fsm.allowed_piece("bpm: ")      # whole forced key in one token
    fsm.step("bpm: ")
    assert fsm.allowed_piece("12")          # multi-char numeric token (-> 12x reachable)
    fsm.step("12")
    assert not fsm.allowed_piece("\n")      # 12 < bpm lower bound 30
    fsm.step("0")                           # 120
    assert fsm.allowed_piece("\n")


def test_genres_vocab_file_loading(tmp_path, monkeypatch):
    from acestep_tpu.constrained import DEFAULT_GENRES, FSMConfig, load_genres_vocab

    # absent file -> defaults
    monkeypatch.setenv("ACESTEP_TPU_GENRES_FILE", str(tmp_path / "nope.txt"))
    assert load_genres_vocab() == list(DEFAULT_GENRES)

    # file with comments and blanks
    p = tmp_path / "genres.txt"
    p.write_text("# comment\nsynthwave\n\nneo-soul\n  vaporwave  \n")
    monkeypatch.setenv("ACESTEP_TPU_GENRES_FILE", str(p))
    assert load_genres_vocab() == ["synthwave", "neo-soul", "vaporwave"]

    # hot reload on mtime change
    import os, time
    time.sleep(0.01)
    p.write_text("bebop\n")
    os.utime(p, (time.time() + 5, time.time() + 5))
    assert load_genres_vocab() == ["bebop"]

    # FSMConfig default pulls from the file
    cfg = FSMConfig()
    assert cfg.genres_vocab == ["bebop"]


def test_forced_mask_matches_bruteforce():
    """PieceIndex forced-text masks == the O(V) allowed_piece scan (minus
    empty pieces, which make no progress and are excluded by design)."""
    from acestep_tpu import constrained as C

    vocab = VOCAB + ["", "bp", "bpm", "bpm: 12", "m: "]
    fsm = MetadataFSM()
    assert fsm.forced_text == "bpm: "
    got = C.piece_index(vocab).forced_mask(fsm.forced_text)
    want = np.array([bool(p) and fsm.allowed_piece(p) for p in vocab])
    np.testing.assert_array_equal(got, want)
    # multi-char piece covering forced text + value start
    assert got[vocab.index("bpm: 12")]
    assert got[vocab.index("bp")]
    assert not got[vocab.index("zz")]


def test_mask_table_shared_across_instances():
    """Per-state masks are static sets: two FSM instances in the same state
    return the SAME cached array (no O(V) rescan per request)."""
    from acestep_tpu import constrained as C

    vocab = list(VOCAB)
    m1 = MetadataFSM().allowed(vocab)
    m2 = MetadataFSM().allowed(vocab)
    assert m1 is m2
    # ...but user metadata changes the state signature
    f3 = MetadataFSM(user_metadata={"bpm": "120"})
    for p in "bpm: ":
        f3.step(p)
    f1 = MetadataFSM()
    for p in "bpm: ":
        f1.step(p)
    a, b = f1.allowed(vocab), f3.allowed(vocab)
    assert a[vocab.index("9")] and not b[vocab.index("9")]
    assert b[vocab.index("1")]


def test_fsm_generation_still_valid_under_tables():
    """End-to-end FSM drive exercises forced fast path + value states."""
    text, fsm = _greedy_fsm(seed=11)
    assert fsm.done and text.endswith("</think>")
