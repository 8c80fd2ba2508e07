"""Device mesh construction and topology tiers.

The reference's parallelism is NCCL tensor-parallelism for the LM only
(nano-vllm linear.py:54-152); here ONE jax mesh carries TP for the DiT, the LM
and the VAE plus DP across hosts (SURVEY.md §5.8).  Axes:

  dp — data parallel (independent song requests / batch shards); rides DCN
       across hosts, ICI within a slice.
  tp — tensor parallel (attention heads / MLP columns); must ride ICI.

The tier table is the TPU analog of the reference's VRAM tiers
(acestep/gpu_config.py:134-283): given a device count, pick (dp, tp).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class TopologyTier:
    n_devices: int
    dp: int
    tp: int
    max_batch: int
    max_duration_s: float


# defaults per device count — TP covers the DiT's 16 attention heads (so tp <= 8
# keeps >= 2 heads per shard and divides the 8 KV heads evenly)
TIERS = {
    1: TopologyTier(1, dp=1, tp=1, max_batch=8, max_duration_s=600.0),
    2: TopologyTier(2, dp=1, tp=2, max_batch=8, max_duration_s=600.0),
    4: TopologyTier(4, dp=1, tp=4, max_batch=8, max_duration_s=600.0),
    8: TopologyTier(8, dp=2, tp=4, max_batch=16, max_duration_s=600.0),
    16: TopologyTier(16, dp=4, tp=4, max_batch=32, max_duration_s=600.0),
    32: TopologyTier(32, dp=8, tp=4, max_batch=64, max_duration_s=600.0),
}


def tier_for(n_devices: int) -> TopologyTier:
    if n_devices in TIERS:
        return TIERS[n_devices]
    # fall back: tp = gcd-ish largest power of two <= 8 dividing n
    tp = 1
    for cand in (8, 4, 2):
        if n_devices % cand == 0:
            tp = cand
            break
    return TopologyTier(n_devices, dp=n_devices // tp, tp=tp,
                        max_batch=8 * n_devices, max_duration_s=600.0)


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None or tp is None:
        tier = tier_for(n)
        dp = dp or tier.dp
        tp = tp or tier.tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
