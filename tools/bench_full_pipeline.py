#!/usr/bin/env python
"""Full-pipeline benchmark (BASELINE.json configs[2]-shape):
acestep-5Hz-lm-0.6B planner (INT8 KV cache) codes phase + DiT Q4_K + VAE,
120 s song, single chip.  Random weights; byte-level demo tokenizer.

Prints one JSON line with the phase breakdown.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def build_demo_vocab(size: int) -> list:
    """Realistic-scale tokenizer piece list (Qwen3-shaped: 151,936 entries):
    newline variants, the metadata field keys at several granularities, all
    0-999 numerals, keyscale/language/genre fragments, a caption word pool,
    and distinct filler subwords.  The DFA-constrained think-mode bench needs
    a vocab whose SIZE and piece mix match production — mask-gather cost and
    DFA state count both scale with it."""
    from acestep_tpu.constrained import (DEFAULT_GENRES, FIELD_ORDER, KEYS,
                                         LANGUAGES)

    pieces = ["<eos>", "</think>", "\n", "\n\n", ": ", ":", " ", "<think>"]
    for f in FIELD_ORDER:
        pieces += [f, f + ":", f + ": ", "\n" + f, "\n" + f + ": ", f[:3], f[3:]]
    pieces += [str(n) for n in range(1000)]
    pieces += KEYS + [" major", " minor", "major", "minor", "m", "aj", "in",
                      "or", "ajor", "inor"]
    pieces += LANGUAGES
    for g in DEFAULT_GENRES:
        pieces += [g, g[:2], g[2:], " " + g]
    words = ["warm", "dream", "night", "synth", "drive", "slow", "deep",
             "neon", "rain", "city", "soft", "analog", "tape", "dust",
             "golden", "haze", "pulse", "wave", "drift", "glow"]
    pieces += words + [" " + w for w in words] + [",", ".", "!", "?", "'s"]
    for a in "abcdefghijklmnopqrstuvwxyz":
        pieces += [a, a.upper(), " " + a]
    seen, out = set(), []
    for p in pieces:
        if p not in seen:
            seen.add(p)
            out.append(p)
    i = 0
    while len(out) < size:
        out.append(f"§w{i}")          # distinct filler subwords
        i += 1
    return out[:size]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=120.0)
    ap.add_argument("--quant", default="q4_k")
    ap.add_argument("--lm-quant", default="q8_0")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--thinking", action="store_true",
                    help="two-phase CoT (device-DFA constrained) + codes "
                         "(the reference's '+think' benchmark row)")
    args = ap.parse_args()

    import jax

    cache = _os.path.abspath(".jax_cache")
    _os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from acestep_tpu.config import QWEN3_0_6B
    from acestep_tpu.inference import GenerationParams, generate_music
    from acestep_tpu.lm_pipeline import LMPipeline
    from acestep_tpu.models import qwen
    from acestep_tpu.pipeline import build_random_engine
    from acestep_tpu.quant import quantize_tree_jax

    def log(m):
        print(f"[fullpipe {time.time()-T0:7.1f}s] {m}", file=_sys.stderr, flush=True)

    log(f"building engine (DiT {args.quant}) ...")
    engine = build_random_engine(jax.random.key(0), quant=args.quant)

    log(f"building LM 0.6B ({args.lm_quant}, int8 KV) ...")
    lm_cfg = QWEN3_0_6B

    def build_lm(k):
        p = qwen.init_params(k, lm_cfg, dtype=jnp.bfloat16)
        p = quantize_tree_jax(p, args.lm_quant)
        return p  # serving decode iterates layer list; keep unstacked

    lm_params = jax.jit(build_lm)(jax.random.key(7))

    class ByteTok:
        eos_token_id = 151643
        think_end_id = 151644
        audio_code_base_id = 151669 - 64000  # leaves room below vocab top

        def encode(self, text):
            return [b % 50000 for b in text.encode()][:512]

        def decode(self, ids):
            out = []
            for i in ids:
                i = int(i)
                if i == self.think_end_id:
                    out.append("</think>")
                elif i >= self.audio_code_base_id:
                    out.append(f"<|audio_code_{i - self.audio_code_base_id}|>")
                else:
                    out.append(chr(i % 94 + 32))
            return "".join(out)

    if args.thinking:
        vocab = build_demo_vocab(lm_cfg.vocab_size)

        class DemoVocabTok(ByteTok):
            def vocab_strs(self):
                return vocab

            def decode(self, ids):
                out = []
                for i in ids:
                    i = int(i)
                    if i == self.think_end_id:
                        out.append("</think>")
                    elif i >= self.audio_code_base_id:
                        out.append(f"<|audio_code_{i - self.audio_code_base_id}|>")
                    elif 0 <= i < len(vocab):
                        out.append(vocab[i])
                return "".join(out)

        tok = DemoVocabTok()
        log("compiling metadata DFA (one-time, cached per vocab) ...")
        t_dfa = time.time()
        from acestep_tpu.constrained import compile_dfa

        dfa = compile_dfa(vocab)
        log(f"DFA: {dfa.n_states} states, exc width {dfa.exc_tok.shape[1]}, "
            f"masks {dfa.masks_packed.nbytes / 1e6:.1f} MB "
            f"({time.time() - t_dfa:.1f}s)")
    else:
        tok = ByteTok()
    lm = LMPipeline(lm_params, lm_cfg, tok)

    params = GenerationParams(
        caption="epic orchestral with soaring strings",
        lyrics="[verse]\nacross the silver sea\n[chorus]\nrise again\n",
        duration=args.duration,
        thinking=args.thinking,           # +think: CoT phase (device DFA) first
        bpm=100 if not args.thinking else None,
        style_token_ids=np.random.default_rng(0).integers(0, 150000, (1, 64)),
        lyric_token_ids=np.random.default_rng(1).integers(0, 150000, (1, 256)),
    )

    log("warmup (compiles)...")
    res = generate_music(engine, lm, params)
    log(f"warmup done: { {k: round(v,2) for k,v in res.time_costs.items()} }")

    runs = []
    for i in range(args.runs):
        t0 = time.time()
        res = generate_music(engine, lm, params)
        runs.append(time.time() - t0)
        log(f"run {i}: { {k: round(v,3) for k,v in res.time_costs.items()} }")

    n_codes = len(res.lm_result.code_indices) if res.lm_result else 0
    think = "+think CoT(device-DFA) " if args.thinking else ""
    print(json.dumps({
        "metric": f"seconds per {args.duration:.0f}s song, full pipeline "
                  f"(LM-0.6B {args.lm_quant} int8-KV {think}codes "
                  f"+ DiT {args.quant} + VAE), batch=1",
        "value": round(float(np.median(runs)), 3),
        "unit": "s",
        "n_codes": n_codes,
        "phase_costs": {k: round(v, 3) for k, v in res.time_costs.items()},
    }))


T0 = time.time()

if __name__ == "__main__":
    main()
