"""Example fixtures: schema check + mapping into GenerationParams."""

import glob
import json

from acestep_tpu.inference import GenerationParams


def test_fixtures_parse():
    paths = sorted(glob.glob("examples/text2music/example_*.json"))
    assert len(paths) >= 20
    for p in paths:
        with open(p) as f:
            ex = json.load(f)
        for key in ("caption", "lyrics", "bpm", "duration", "keyscale",
                    "language", "timesignature", "think", "task_type"):
            assert key in ex, (p, key)
        params = GenerationParams(
            caption=ex["caption"], lyrics=ex["lyrics"], bpm=ex["bpm"],
            duration=float(ex["duration"]), keyscale=ex["keyscale"],
            language=ex["language"], timesignature=str(ex["timesignature"]),
            thinking=bool(ex["think"]), task_type=ex["task_type"],
        )
        assert 10 <= params.duration <= 600
        assert 30 <= params.bpm <= 300


def test_simple_mode_fixtures():
    paths = sorted(glob.glob("examples/simple_mode/example_*.json"))
    assert len(paths) >= 100
    for p in paths[:50]:
        with open(p) as f:
            ex = json.load(f)
        assert ex.get("description")
        assert "language" in ex and "seed" in ex


def test_fixture_count_matches_reference_scale():
    # reference ships 200 + 200 fixtures (examples/text2music, simple_mode)
    assert len(glob.glob("examples/text2music/example_*.json")) == 200
    assert len(glob.glob("examples/simple_mode/example_*.json")) == 200
