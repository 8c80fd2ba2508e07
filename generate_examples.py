#!/usr/bin/env python
"""Generate request fixtures (analog of the reference's generate_examples.py +
examples/text2music/*.json schema: caption/lyrics/bpm/duration/keyscale/
language/timesignature/think).

Deterministic templated fixtures; with a loaded LM pipeline (--use-lm) the
captions are expanded through the create_sample flow instead."""

from __future__ import annotations

import argparse
import json
import os
import random

GENRES = [
    ("synthwave", 105, "A minor", "en"),
    ("neo-soul", 82, "Eb major", "en"),
    ("lo-fi hip hop", 74, "C major", "en"),
    ("city pop", 112, "D major", "ja"),
    ("k-pop", 124, "G major", "ko"),
    ("folk ballad", 68, "E minor", "en"),
    ("house", 126, "F minor", "en"),
    ("orchestral epic", 95, "D minor", "en"),
    ("latin pop", 98, "A major", "es"),
    ("jazz trio", 140, "Bb major", "en"),
    ("metalcore", 155, "Drop D minor", "en"),
    ("ambient drone", 60, "C minor", "en"),
]

MOODS = ["dreamy", "melancholic", "triumphant", "laid-back", "frenetic", "warm"]
INSTS = ["analog synths", "rhodes piano", "nylon guitar", "string ensemble",
         "808 bass", "brushed drums", "tape-saturated pads", "vocoder harmonies"]

VERSES = [
    "neon rivers running through the midnight town",
    "footsteps echo where the old world fell",
    "paper lanterns drifting out to sea",
    "static on the radio and open road",
]
CHORUS = [
    "we are the waves that never break",
    "hold the light until the morning comes",
    "run with me beyond the fading line",
]


def make_example(i: int, rng: random.Random) -> dict:
    genre, bpm, keyscale, lang = GENRES[i % len(GENRES)]
    mood = rng.choice(MOODS)
    inst = rng.sample(INSTS, 2)
    duration = rng.choice([30, 60, 90, 120, 180, 240])
    lyrics = (
        f"[verse]\n{rng.choice(VERSES)}\n{rng.choice(VERSES)}\n"
        f"[chorus]\n{rng.choice(CHORUS)}\n{rng.choice(CHORUS)}\n"
    )
    return {
        "caption": f"{mood} {genre} with {inst[0]} and {inst[1]}",
        "lyrics": lyrics,
        "bpm": bpm + rng.randint(-6, 6),
        "duration": duration,
        "keyscale": keyscale,
        "language": lang,
        "timesignature": rng.choice(["3", "4", "4", "4", "6"]),
        "think": rng.random() < 0.5,
        "task_type": "text2music",
        "seed": i,
    }


SIMPLE_QUERIES = [
    "a song for driving at night through the city",
    "something to study to, no vocals",
    "an anthem for the last day of summer",
    "music for a rainy sunday morning",
    "a fierce workout track that builds",
    "wedding first-dance song, timeless feel",
    "a lullaby with a music-box quality",
    "road-trip singalong with big harmonies",
]


def make_simple_example(i: int, rng: random.Random) -> dict:
    """simple_mode fixture: free-text query only (reference examples/simple_mode)."""
    genre, _, _, lang = GENRES[i % len(GENRES)]
    q = rng.choice(SIMPLE_QUERIES)
    return {
        "description": f"{q}, leaning {genre}",
        "language": lang,
        "think": True,
        "seed": i,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/text2music")
    ap.add_argument("--simple-out", default="examples/simple_mode")
    ap.add_argument("--count", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = random.Random(args.seed)
    os.makedirs(args.out, exist_ok=True)
    for i in range(args.count):
        ex = make_example(i, rng)
        with open(os.path.join(args.out, f"example_{i:03d}.json"), "w") as f:
            json.dump(ex, f, indent=2, ensure_ascii=False)
    os.makedirs(args.simple_out, exist_ok=True)
    for i in range(args.count):
        ex = make_simple_example(i, rng)
        with open(os.path.join(args.simple_out, f"example_{i:03d}.json"), "w") as f:
            json.dump(ex, f, indent=2, ensure_ascii=False)
    print(f"wrote {args.count} fixtures to {args.out} and {args.simple_out}")


if __name__ == "__main__":
    main()
