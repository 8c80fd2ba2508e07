"""Oobleck VAE tests.

The risky numerics are the torch-conv semantics (padding/stride/dilation/
transpose) — the reference needed explicit center-crop emulation to match
(acestep_ggml/cpp/acestep_vae_model.cpp:694-722).  We verify our lax
formulations against torch.nn.functional exhaustively, then check structural
invariants (hop relationship, tiled == full decode within seam tolerance).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.config import VAEConfig
from acestep_tpu.models import vae

TINY = VAEConfig(
    audio_channels=2,
    encoder_hidden_size=16,
    decoder_channels=8,
    decoder_input_channels=8,
    sampling_rate=48000,
    downsampling_ratios=(2, 4, 4),     # hop 32
    channel_multiples=(1, 2, 4),
)


class TestConvParity:
    @pytest.mark.parametrize("stride,pad,dil,k", [
        (1, 3, 1, 7), (1, 0, 1, 1), (1, 3, 1, 7), (1, 9, 3, 7), (1, 27, 9, 7),
        (2, 1, 1, 4), (4, 2, 1, 8), (8, 4, 1, 16), (6, 3, 1, 12), (10, 5, 1, 20),
        (1, 1, 1, 3),
    ])
    def test_conv1d_matches_torch(self, stride, pad, dil, k):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        cin, cout, L = 3, 5, 64
        x = rng.standard_normal((2, L, cin)).astype(np.float32)
        w = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.2
        b = rng.standard_normal((cout,)).astype(np.float32)

        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
            torch.from_numpy(b), stride=stride, padding=pad, dilation=dil,
        ).numpy().transpose(0, 2, 1)

        ours = np.asarray(vae.conv1d(
            jnp.asarray(x), jnp.asarray(w.transpose(2, 1, 0)), jnp.asarray(b),
            stride=stride, padding=pad, dilation=dil,
        ))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    @pytest.mark.parametrize("stride,k", [
        (2, 4), (4, 8), (8, 16), (6, 12), (10, 20), (3, 6), (5, 10),
    ])
    def test_conv_transpose1d_matches_torch(self, stride, k):
        torch = pytest.importorskip("torch")
        pad = math.ceil(stride / 2)
        rng = np.random.default_rng(1)
        cin, cout, L = 4, 3, 32
        x = rng.standard_normal((2, L, cin)).astype(np.float32)
        w = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.2
        b = rng.standard_normal((cout,)).astype(np.float32)

        ref = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
            torch.from_numpy(b), stride=stride, padding=pad,
        ).numpy().transpose(0, 2, 1)

        # converter mapping: [in, out, k] -> spatially reversed [k, in, out]
        w_lax = w.transpose(2, 0, 1)[::-1].copy()
        ours = np.asarray(vae.conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w_lax), jnp.asarray(b),
            stride=stride, padding=pad,
        ))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestSnake:
    def test_formula(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 8, 4)).astype(np.float32)
        alpha = rng.standard_normal(4).astype(np.float32) * 0.5
        beta = rng.standard_normal(4).astype(np.float32) * 0.5
        out = np.asarray(vae.snake(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta)))
        a, b = np.exp(alpha), np.exp(beta)
        ref = x + (1.0 / (b + 1e-9)) * np.sin(a * x) ** 2
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_large_alpha_no_overflow(self):
        # fp16 would overflow exp(alpha) at alpha > ~11 (mlx_vae/model.py:40-51)
        x = jnp.ones((1, 4, 2), jnp.float32)
        out = vae.snake(x, jnp.full((2,), 12.0), jnp.full((2,), 12.0))
        assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def setup():
    return vae.init_params(jax.random.key(0), TINY)


class TestEndToEnd:
    def test_decode_shape(self, setup):
        params = setup
        t = 12
        lat = jnp.asarray(np.random.default_rng(3).standard_normal(
            (2, t, TINY.decoder_input_channels)), jnp.float32)
        audio = vae.decode(params, TINY, lat)
        assert audio.shape == (2, t * TINY.hop_length, TINY.audio_channels)

    def test_encode_shape(self, setup):
        params = setup
        t = 8
        audio = jnp.asarray(np.random.default_rng(4).standard_normal(
            (1, t * TINY.hop_length, 2)) * 0.1, jnp.float32)
        lat = vae.encode(params, TINY, audio)
        assert lat.shape == (1, t, TINY.encoder_hidden_size // 2)

    def test_encode_sample_differs_from_mean(self, setup):
        params = setup
        audio = jnp.asarray(np.random.default_rng(5).standard_normal(
            (1, 4 * TINY.hop_length, 2)) * 0.1, jnp.float32)
        mean = vae.encode(params, TINY, audio)
        z = vae.encode_and_sample(params, TINY, audio, jax.random.key(1))
        assert z.shape == mean.shape
        assert np.abs(np.asarray(z) - np.asarray(mean)).max() > 1e-5

    def test_tiled_decode_matches_full(self, setup):
        """With overlap >= decoder receptive field (probed: 18 frames for this
        random-init tiny config), tiled decode must reproduce the full decode.
        Trained VAEs have a smaller effective RF; the C++ runtime uses overlap
        32-64 (acestep_ggml.cpp:2114-2229)."""
        params = setup
        t = 96
        lat = jnp.asarray(np.random.default_rng(6).standard_normal(
            (1, t, TINY.decoder_input_channels)), jnp.float32)
        full = np.asarray(vae.decode(params, TINY, lat))
        tiled = np.asarray(vae.tiled_decode(params, TINY, lat,
                                            chunk_frames=60, overlap_frames=20))
        assert tiled.shape == full.shape
        err = np.abs(tiled - full) / (np.abs(full).mean())
        assert np.median(err) < 1e-5
        assert err.max() < 1e-4

    def test_tiled_decode_host_assemble_int16_transfer(self, setup, monkeypatch):
        """host_assemble fetches int16 at the song's global peak scale; the
        roundtrip error is bounded by one 16-bit LSB of the peak — the same
        precision the final WAV keeps."""
        params = setup
        t = 96
        lat = jnp.asarray(np.random.default_rng(6).standard_normal(
            (1, t, TINY.decoder_input_channels)), jnp.float32)
        monkeypatch.setenv("ACESTEP_TPU_D2H_INT16", "0")
        f32 = np.asarray(vae.tiled_decode(params, TINY, lat, chunk_frames=60,
                                          overlap_frames=20, host_assemble=True))
        monkeypatch.setenv("ACESTEP_TPU_D2H_INT16", "1")
        i16 = vae.tiled_decode(params, TINY, lat, chunk_frames=60,
                               overlap_frames=20, host_assemble=True)
        assert isinstance(i16, np.ndarray) and i16.dtype == np.float32
        assert i16.shape == f32.shape
        lsb = np.abs(f32).max() / 32767.0
        assert np.abs(i16 - f32).max() <= lsb * 0.51  # round-to-nearest

    def test_fused_tiled_decode_matches_tiled(self, setup):
        """The single-dispatch fused program must reproduce the chunked loop
        (same window plan) within one int16 LSB of the peak."""
        params = setup
        t = 96
        lat = jnp.asarray(np.random.default_rng(6).standard_normal(
            (1, t, TINY.decoder_input_channels)), jnp.float32)
        ref = np.asarray(vae.tiled_decode(params, TINY, lat,
                                          chunk_frames=60, overlap_frames=20))
        i16, scale = vae.fused_tiled_decode_int16(
            params, TINY, lat, chunk_frames=60, overlap_frames=20)
        out = np.asarray(i16, np.float32).reshape(ref.shape) / float(scale)
        # quant step: 1/scale = max(peak/0.99, 1)/32767 (WAV output scale)
        lsb = max(np.abs(ref).max() / 0.99, 1.0) / 32767.0
        assert np.abs(out - ref).max() <= lsb * 0.51

    def test_fused_decode_many_windows_bounded_batch(self, setup):
        """Many interior windows through lax.map with a small window batch
        (incl. a remainder chunk) must still match the reference loop."""
        params = setup
        t = 160
        lat = jnp.asarray(np.random.default_rng(7).standard_normal(
            (1, t, TINY.decoder_input_channels)), jnp.float32)
        ref = np.asarray(vae.tiled_decode(params, TINY, lat,
                                          chunk_frames=40, overlap_frames=8))
        i16, scale = vae.fused_tiled_decode_int16(
            params, TINY, lat, chunk_frames=40, overlap_frames=8,
            max_window_batch=2)
        out = np.asarray(i16, np.float32).reshape(ref.shape) / float(scale)
        # quant step: 1/scale = max(peak/0.99, 1)/32767 (WAV output scale)
        lsb = max(np.abs(ref).max() / 0.99, 1.0) / 32767.0
        assert np.abs(out - ref).max() <= lsb * 0.51

    def test_fused_decode_full_path_when_chunk_covers(self, setup):
        params = setup
        lat = jnp.asarray(np.random.default_rng(8).standard_normal(
            (2, 40, TINY.decoder_input_channels)), jnp.float32)
        full = np.asarray(vae.decode(params, TINY, lat))
        i16, scale = vae.fused_tiled_decode_int16(params, TINY, lat,
                                                  chunk_frames=512)
        out = np.asarray(i16, np.float32).reshape(full.shape) / float(scale)
        lsb = max(np.abs(full).max() / 0.99, 1.0) / 32767.0
        assert np.abs(out - full).max() <= lsb * 0.51

    def test_fused_decode_merged_batch_bounded(self, setup):
        """b>1 (a merged continuous-batching request) with max_window_batch=1
        must decode item-slices through the bounded map — NOT the whole batch
        per window (the configs[3] cross-bucket OOM) — and match the full
        per-batch decode exactly (windowed + single-window paths)."""
        params = setup
        for t, chunk in [(96, 40), (40, 512)]:     # windowed / chunk>=t paths
            lat = jnp.asarray(np.random.default_rng(9).standard_normal(
                (3, t, TINY.decoder_input_channels)), jnp.float32)
            ref = np.asarray(vae.tiled_decode(params, TINY, lat,
                                              chunk_frames=chunk,
                                              overlap_frames=8))
            i16, scale = vae.fused_tiled_decode_int16(
                params, TINY, lat, chunk_frames=chunk, overlap_frames=8,
                max_window_batch=1)
            out = np.asarray(i16, np.float32).reshape(ref.shape) / float(scale)
            lsb = max(np.abs(ref).max() / 0.99, 1.0) / 32767.0
            assert np.abs(out - ref).max() <= lsb * 0.51, (t, chunk)

    def test_tiled_decode_merged_batch_bounded(self, setup):
        """tiled_decode with b > max_window_batch slices the batch per call
        and matches the unbounded decode."""
        params = setup
        lat = jnp.asarray(np.random.default_rng(10).standard_normal(
            (3, 96, TINY.decoder_input_channels)), jnp.float32)
        ref = np.asarray(vae.tiled_decode(params, TINY, lat,
                                          chunk_frames=60, overlap_frames=20,
                                          max_window_batch=8))
        out = np.asarray(vae.tiled_decode(params, TINY, lat,
                                          chunk_frames=60, overlap_frames=20,
                                          max_window_batch=1))
        assert np.abs(out - ref).max() < 1e-5

    def test_tiled_decode_insufficient_overlap_has_seams(self, setup):
        """Sanity check on the probe: small overlap must NOT match — guards against
        the comparison accidentally passing for trivial reasons."""
        params = setup
        t = 96
        lat = jnp.asarray(np.random.default_rng(6).standard_normal(
            (1, t, TINY.decoder_input_channels)), jnp.float32)
        full = np.asarray(vae.decode(params, TINY, lat))
        tiled = np.asarray(vae.tiled_decode(params, TINY, lat,
                                            chunk_frames=16, overlap_frames=2))
        assert np.abs(tiled - full).max() > 1e-2

    def test_tiled_encode_matches_full(self, setup):
        # encoder receptive field of the random-init tiny config probes at
        # ~16 latent frames; overlap 18 covers it
        params = setup
        t = 96
        audio = jnp.asarray(np.random.default_rng(7).standard_normal(
            (1, t * TINY.hop_length, 2)) * 0.1, jnp.float32)
        full = np.asarray(vae.encode(params, TINY, audio))
        tiled = np.asarray(vae.tiled_encode(params, TINY, audio,
                                            chunk_frames=56, overlap_frames=18))
        assert tiled.shape == full.shape
        err = np.abs(tiled - full) / (np.abs(full).mean() + 1e-12)
        assert np.median(err) < 1e-5
        assert err.max() < 1e-3

    def test_silence_latents(self, setup):
        params = setup
        lat = vae.silence_latents(params, TINY, n_frames=20, chunk_frames=8)
        assert lat.shape == (1, 20, TINY.encoder_hidden_size // 2)
        # silence latents are constant in the interior (conv edge effects only)
        interior = np.asarray(lat[0, 8:12])
        assert np.abs(interior - interior[0]).max() < 1e-4

    def test_default_config_hop_is_1920(self):
        cfg = VAEConfig()
        assert cfg.hop_length == 1920            # 48 kHz / 1920 = 25 Hz latents
        assert cfg.latent_rate == 25.0
        assert cfg.decoder_input_channels == 64


def test_conv_transpose_subpixel_matches_dilated():
    """Subpixel convT (stride>1 fast path) is numerically identical to the
    lhs_dilation formulation across the decoder's (k=2s, p=ceil(s/2)) family
    and generic shapes."""
    import math
    import os

    rng = np.random.default_rng(7)
    cases = [(10, 16, 8, 13), (6, 8, 8, 25), (4, 8, 4, 31), (2, 4, 4, 50),
             (3, 5, 7, 17)]
    for s, cin, cout, L in cases:
        k, p = 2 * s, math.ceil(s / 2)
        x = jnp.asarray(rng.standard_normal((2, L, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        os.environ["ACESTEP_TPU_CONVT_SUBPIXEL"] = "0"
        try:
            ref = vae.conv_transpose1d(x, w, b, stride=s, padding=p)
        finally:
            os.environ.pop("ACESTEP_TPU_CONVT_SUBPIXEL", None)
        new = vae.conv_transpose1d(x, w, b, stride=s, padding=p)
        assert ref.shape == new.shape
        assert float(jnp.abs(ref - new).max()) < 1e-4
