"""Lyric alignment tests: DTW path, timestamps, LRC, cross-attn maps."""

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu import alignment
from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit


class TestDTW:
    def test_diagonal_attention_gives_diagonal_path(self):
        n = 16
        sim = np.eye(n) + 0.01
        path = alignment.dtw_path(sim)
        assert path[0] == (0, 0) and path[-1] == (n - 1, n - 1)
        # mostly diagonal moves
        diag = sum(1 for (a, b) in path if a == b)
        assert diag >= n - 2

    def test_monotonic(self):
        rng = np.random.default_rng(0)
        sim = rng.random((20, 9))
        path = alignment.dtw_path(sim)
        ts = [p[0] for p in path]
        ns = [p[1] for p in path]
        assert ts == sorted(ts) and ns == sorted(ns)
        assert path[0] == (0, 0) and path[-1] == (19, 8)

    def test_token_timestamps_monotone(self):
        n_t, n_tok = 40, 10
        sim = np.zeros((n_t, n_tok))
        for j in range(n_tok):               # each token active in its own span
            sim[j * 4:(j + 1) * 4, j] = 1.0
        stamps = alignment.token_timestamps(sim, n_tok, patch_seconds=0.08)
        assert (np.diff(stamps) >= 0).all()
        assert abs(stamps[0] - 0.0) < 1e-9
        assert stamps[-1] >= 0.08 * 30

    def test_alignment_score_prefers_ridge(self):
        n = 24
        ridge = np.eye(n) * 1.0 + 0.01
        diffuse = np.full((n, n), 1.0 / n)
        assert alignment.alignment_score(ridge, n) > alignment.alignment_score(diffuse, n)

    def test_to_lrc_format(self):
        stamps = np.asarray([0.0, 1.5, 61.25])
        lrc = alignment.to_lrc(["line one", "line two"], [1, 2], stamps)
        lines = lrc.split("\n")
        assert lines[0].startswith("[00:00.00]line one")
        assert lines[1].startswith("[00:01.50]line two")


def test_cross_attention_maps_shapes():
    cfg = DiTConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=8, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
        timbre_hidden_dim=8,
    )
    params = dit.init_params(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    t_len, lc = 12, 6
    lat = jnp.asarray(rng.standard_normal((1, t_len, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, t_len, 16)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((1, lc, 64)), jnp.float32)
    maps = alignment.cross_attention_maps(params, cfg, lat, ctx, enc)
    maps = np.asarray(maps)
    assert maps.shape == (1, t_len // 2, lc)
    # rows are attention distributions
    np.testing.assert_allclose(maps.sum(axis=-1), 1.0, atol=1e-3)
    # full e2e: stamps + lrc
    stamps = alignment.token_timestamps(maps[0], lc, patch_seconds=0.08)
    lrc = alignment.to_lrc(["hello world"], [lc], stamps)
    assert lrc.startswith("[")
