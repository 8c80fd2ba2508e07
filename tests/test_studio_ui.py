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


def test_i18n_full_coverage(html):
    """Every data-i18n key used in the markup has a translation in ALL four
    languages (en/zh/ja/he — the reference gradio_ui/i18n language set)."""
    keys = set(re.findall(r'data-i18n="([^"]+)"', html))
    assert len(keys) > 40, f"expected broad i18n tagging, got {len(keys)}"
    for lang in ("en", "zh", "ja", "he"):
        m = re.search(lang + r":\s*\{(.*?)\n  \},", html, re.S)
        assert m, f"missing i18n dict for {lang}"
        body = m.group(1)
        have = set(re.findall(r"(\w+):", body))
        missing = keys - have
        assert not missing, f"{lang} missing translations: {sorted(missing)}"


def test_hebrew_rtl(html):
    assert 'עברית' in html                       # language switcher entry
    assert 'dir = LANG === "he" ? "rtl" : "ltr"' in html


def test_results_management_controls(html):
    """Server-job rows carry play / re-queue / delete actions wired to the
    management routes."""
    assert "data-requeue" in html and "data-deljob" in html
    assert "/v1/jobs/delete" in html and "/v1/jobs/requeue" in html


def test_training_config_parity(html):
    """Training tab exposes the reference tab's config surface: mode incl.
    lokr, alpha, lokr factor, warmup, checkpoint cadence, seed, export name,
    resume (training_handlers.py:568-967 field set)."""
    ids = _ids(html)
    for el in ("tr-mode", "tr-rank", "tr-alpha", "tr-lokr-factor", "tr-steps",
               "tr-lr", "tr-bs", "tr-warmup", "tr-ckpt-every", "tr-seed",
               "tr-export", "tr-resume"):
        assert el in ids, el
    assert ">lokr<" in html
