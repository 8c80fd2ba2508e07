"""FSQ codec + detokenizer bridge tests."""

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu.constants import AUDIO_CODEBOOK_SIZE, CODES_PER_LATENT, LATENT_DIM
from acestep_tpu.models import codec


class TestFSQ:
    def test_index_value_roundtrip_exhaustive_sample(self):
        rng = np.random.default_rng(0)
        idx = jnp.asarray(rng.integers(0, AUDIO_CODEBOOK_SIZE, 500), jnp.int32)
        vals = codec.indices_to_values(idx)
        back = codec.values_to_indices(vals)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))

    def test_edge_indices(self):
        for i in (0, 1, AUDIO_CODEBOOK_SIZE - 1):
            v = codec.indices_to_values(jnp.asarray([i]))
            assert (np.abs(np.asarray(v)) <= 1.0 + 1e-6).all()
            assert int(codec.values_to_indices(v)[0]) == i

    def test_values_snap_to_grid(self):
        # noisy values snap to the nearest grid point
        idx = jnp.asarray([123, 456], jnp.int32)
        v = codec.indices_to_values(idx)
        noisy = v + 0.05
        np.testing.assert_array_equal(
            np.asarray(codec.values_to_indices(noisy)), np.asarray(idx))


class TestBridge:
    def test_detokenize_shape(self):
        params = codec.init_params(jax.random.key(0), hidden=32)
        idx = jnp.asarray(np.random.default_rng(1).integers(0, AUDIO_CODEBOOK_SIZE, (2, 10)), jnp.int32)
        lat = codec.detokenize(params, idx)
        assert lat.shape == (2, 10 * CODES_PER_LATENT, LATENT_DIM)
        assert np.isfinite(np.asarray(lat)).all()

    def test_tokenize_shape(self):
        params = codec.init_params(jax.random.key(0), hidden=32)
        lat = jnp.asarray(np.random.default_rng(2).standard_normal((1, 50, LATENT_DIM)), jnp.float32)
        idx = codec.tokenize(params, lat)
        assert idx.shape == (1, 10)
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < AUDIO_CODEBOOK_SIZE).all()

    def test_codes_to_latents_pad_crop(self):
        params = codec.init_params(jax.random.key(0), hidden=32)
        idx = np.arange(10, dtype=np.int32)
        lat = codec.codes_to_latents(params, idx, target_frames=60)
        assert lat.shape == (1, 60, LATENT_DIM)
        assert not np.asarray(lat[0, 55:]).any()      # padded region is zero
        lat2 = codec.codes_to_latents(params, idx, target_frames=30)
        assert lat2.shape == (1, 30, LATENT_DIM)
