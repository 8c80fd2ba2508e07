"""Studio UI surface test: the self-contained HTML must carry every control
the serving API exposes (the reference's gradio tabs — generation, results,
training, dataset, LoRA — plus the LM inspiration/format flows wired to
/create_random_sample and /format_input, gradio_ui events/ dice + format
buttons)."""

import os
import re

import pytest

UI = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "acestep_tpu", "ui", "studio.html",
)


@pytest.fixture(scope="module")
def html():
    with open(UI, encoding="utf-8") as f:
        return f.read()


def _ids(html):
    return set(re.findall(r'id="([^"]+)"', html))


def test_tabs_present(html):
    ids = _ids(html)
    for tab in ("tab-gen", "tab-res", "tab-train", "tab-data", "tab-lora", "tab-stats"):
        assert tab in ids, tab


def test_generation_controls(html):
    ids = _ids(html)
    for el in ("caption", "lyrics", "duration", "bpm", "seed", "batch", "task",
               "shift", "thinking", "fmt", "go",
               # audio-input serving controls (repaint/cover/extract)
               "src-audio", "ref-audio", "rp-start", "rp-end", "track-name",
               "cover-strength",
               # base-model guidance
               "gscale", "steps", "adg"):
        assert el in ids, el


def test_lm_flows_wired(html):
    """Inspire + format buttons call the REST endpoints the server exposes."""
    ids = _ids(html)
    assert "inspire" in ids and "format-prompt" in ids
    assert "/create_random_sample" in html
    assert "/format_input" in html


def test_endpoints_referenced_exist_in_server(html):
    """Every endpoint the UI fetches must be handled by api_server.py."""
    server_path = os.path.join(os.path.dirname(UI), "..", "serving", "api_server.py")
    with open(server_path, encoding="utf-8") as f:
        server = f.read()
    eps = set(re.findall(r'(?:fetch|post)\("(/[^"?]+)', html))
    assert eps, "no endpoints found in UI"
    for ep in eps:
        assert ep in server, f"UI references unhandled endpoint {ep}"


def test_i18n_covers_tabs(html):
    for lang in ("en:", "zh:", "ja:"):
        assert lang in html
    for key in ("dataset", "training", "lora"):
        assert f"{key}:" in html
