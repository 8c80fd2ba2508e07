"""Token-file builder + tokenizer.json adapter tests (tiny WordLevel tokenizer)."""

import json
import subprocess
import sys

import pytest

tokenizers = pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def tok_file(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"[UNK]": 0, "dreamy": 1, "synthwave": 2, "la": 3, "#": 4,
             "Instruction": 5, "Caption": 6, "Metas": 7, "bpm": 8, ":": 9,
             "105": 10}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    # special tokens tokenize atomically (like the real checkpoint tokenizer)
    tok.add_special_tokens(["</think>", "<|im_end|>", "<|audio_code_0|>"])
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return str(path)


def test_build_token_files(tok_file, tmp_path):
    out = tmp_path / "tokens"
    res = subprocess.run(
        [sys.executable, "tools/build_cli_token_files.py",
         "--tokenizer", tok_file, "--caption", "dreamy synthwave",
         "--metas", "bpm : 105", "--lyrics", "la la la",
         "--out-dir", str(out)],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    style = (out / "style_tokens.txt").read_text().split()
    lyric = (out / "lyric_tokens.txt").read_text().split()
    assert len(style) > 0 and all(s.isdigit() for s in style)
    assert lyric == ["3", "3", "3"]


def test_tokenizer_json_adapter(tok_file):
    from acestep_tpu.lm_pipeline import TokenizerJsonAdapter

    ad = TokenizerJsonAdapter(tok_file)
    assert ad.eos_token_id == ad.tok.token_to_id("<|im_end|>")
    assert ad.think_end_id == ad.tok.token_to_id("</think>")
    assert ad.audio_code_base_id == ad.tok.token_to_id("<|audio_code_0|>")
    ids = ad.encode("dreamy synthwave la")
    assert ids == [1, 2, 3]
