#!/usr/bin/env python
"""Build style/lyric token files for the native CLI, formatted exactly like the
Python pipeline's text-encoder inputs (analog of scripts/build_cli_token_files.py:
style goes through the SFT_GEN_PROMPT template, lyrics tokenize raw).

Usage:
  python tools/build_cli_token_files.py --tokenizer /ckpt/tokenizer.json \
      --caption "dreamy synthwave" --metas "bpm: 105" \
      --lyrics-file lyrics.txt --out-dir token_files/
Then:
  python cli.py --pipeline-style-lyric \
      --style-tokens token_files/style_tokens.txt \
      --lyric-tokens token_files/lyric_tokens.txt
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

from acestep_tpu.constants import DEFAULT_DIT_INSTRUCTION, MAX_LYRIC_TOKENS, MAX_STYLE_TOKENS, SFT_GEN_PROMPT


def build_style_text(caption: str, metas: str, instruction: str = DEFAULT_DIT_INSTRUCTION) -> str:
    """The exact prompt the DiT text-encoder sees (SFT_GEN_PROMPT, constants)."""
    return SFT_GEN_PROMPT.format(instruction, caption, metas)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenizer", required=True, help="path to tokenizer.json")
    ap.add_argument("--caption", default="")
    ap.add_argument("--metas", default="")
    ap.add_argument("--instruction", default=DEFAULT_DIT_INSTRUCTION)
    ap.add_argument("--lyrics", default="")
    ap.add_argument("--lyrics-file", default=None)
    ap.add_argument("--out-dir", default="token_files")
    args = ap.parse_args()

    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(args.tokenizer)
    os.makedirs(args.out_dir, exist_ok=True)

    style_text = build_style_text(args.caption, args.metas, args.instruction)
    style_ids = tok.encode(style_text, add_special_tokens=False).ids[:MAX_STYLE_TOKENS]
    with open(os.path.join(args.out_dir, "style_tokens.txt"), "w") as f:
        f.write(" ".join(str(i) for i in style_ids))

    lyrics = args.lyrics
    if args.lyrics_file:
        with open(args.lyrics_file) as f:
            lyrics = f.read()
    if lyrics:
        lyric_ids = tok.encode(lyrics, add_special_tokens=False).ids[:MAX_LYRIC_TOKENS]
        with open(os.path.join(args.out_dir, "lyric_tokens.txt"), "w") as f:
            f.write(" ".join(str(i) for i in lyric_ids))

    print(f"style: {len(style_ids)} tokens" +
          (f"; lyrics: {len(lyric_ids)} tokens" if lyrics else ""))


if __name__ == "__main__":
    main()
