"""Dataset builder + loader for preprocessed training tensors.

Analog of the reference dataset pipeline (acestep/training/data_module.py:33-265,
dataset_builder_modules/): raw songs are preprocessed ONCE (VAE-encode audio,
text-encode caption, embed lyrics) into per-sample safetensors files; training
streams those tensors without touching the big encoders again.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from acestep_tpu.utils.safetensors_io import SafetensorsFile, save_safetensors

SAMPLE_KEYS = ("latents", "context_latents", "encoder_hidden_states", "loss_mask")


def preprocess_sample(
    engine,
    audio: np.ndarray,                 # [L, C] float32
    style_token_ids: np.ndarray,       # [1, Ls]
    lyric_token_ids: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Build one training sample: VAE-encode the target audio to latents and the
    text/lyric condition through the conditioning encoders."""
    import jax.numpy as jnp

    from acestep_tpu.models import vae
    from acestep_tpu.pipeline import GenerationRequest

    hop = engine.vae_cfg.hop_length
    t_frames = audio.shape[0] // hop
    lat = vae.tiled_encode(
        engine.vae_params, engine.vae_cfg,
        jnp.asarray(audio[None, : t_frames * hop, :], jnp.float32),
        chunk_frames=128, overlap_frames=32,
    )
    req = GenerationRequest(
        style_token_ids=style_token_ids, lyric_token_ids=lyric_token_ids
    )
    enc, enc_mask = engine.build_condition(req, 1)
    ctx = engine.build_context_latents(req, 1, t_frames, t_frames)
    return {
        "latents": np.asarray(lat[0], np.float32),
        "context_latents": np.asarray(ctx[0], np.float32),
        "encoder_hidden_states": np.asarray(enc[0], np.float32),
        "encoder_attn_mask": np.asarray(enc_mask[0], np.int32),
        "loss_mask": np.ones((t_frames,), np.float32),
    }


def build_dataset(
    engine,
    samples: Sequence[Dict[str, Any]],   # {audio, style_token_ids, lyric_token_ids?}
    out_dir: str,
) -> str:
    """Preprocess raw samples into <out_dir>/sample_XXXX.safetensors + manifest."""
    os.makedirs(out_dir, exist_ok=True)
    names = []
    for i, s in enumerate(samples):
        tensors = preprocess_sample(
            engine, s["audio"], s["style_token_ids"], s.get("lyric_token_ids")
        )
        name = f"sample_{i:05d}.safetensors"
        save_safetensors(os.path.join(out_dir, name), tensors)
        names.append(name)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"samples": names, "count": len(names)}, f)
    return out_dir


class PreprocessedDataset:
    """Streams preprocessed samples as padded training batches."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.names: List[str] = self.manifest["samples"]

    def __len__(self) -> int:
        return len(self.names)

    def load(self, i: int) -> Dict[str, np.ndarray]:
        st = SafetensorsFile(os.path.join(self.path, self.names[i]))
        return {k: st.tensor(k) for k in st.keys()}

    def batches(
        self, batch_size: int, seed: int = 0, epochs: Optional[int] = None
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Shuffled, padded batches, cycling for `epochs` (None = forever)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(self.names))
            for i0 in range(0, len(order), batch_size):
                idx = order[i0:i0 + batch_size]
                items = [self.load(int(i)) for i in idx]
                t_max = max(it["latents"].shape[0] for it in items)
                lc_max = max(it["encoder_hidden_states"].shape[0] for it in items)

                def pad_t(x, target, axis=0):
                    width = [(0, 0)] * x.ndim
                    width[axis] = (0, target - x.shape[axis])
                    return np.pad(x, width)

                batch = {
                    "latents": np.stack([pad_t(it["latents"], t_max) for it in items]),
                    "context_latents": np.stack(
                        [pad_t(it["context_latents"], t_max) for it in items]),
                    "encoder_hidden_states": np.stack(
                        [pad_t(it["encoder_hidden_states"], lc_max) for it in items]),
                    "encoder_attn_mask": np.stack(
                        [pad_t(it.get("encoder_attn_mask",
                                      np.ones(it["encoder_hidden_states"].shape[0], np.int32)),
                               lc_max) for it in items]),
                    "loss_mask": np.stack(
                        [pad_t(it["loss_mask"], t_max) for it in items]),
                }
                yield {k: jnp.asarray(v) for k, v in batch.items()}
            epoch += 1
