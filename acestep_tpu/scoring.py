"""Test-time scaling: PMI reward scoring for ranking batch candidates.

Analog of acestep/test_time_scaling.py:16-66 — the reward for generated audio
codes is the pointwise mutual information between the conditioning text and the
codes, estimated with the LM itself:

    reward = log P(cond | codes) - log P(cond)

computed as teacher-forced log-likelihoods of the conditioning tokens with and
without the codes in context.  Candidates are ranked by reward
(calculate_reward_score :289); metadata top-k recall (:178-260) checks that the
understanding pass recovers the requested metadata.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen


@functools.partial(jax.jit, static_argnames=("cfg",))
def sequence_logprob(
    params: Dict[str, Any],
    cfg: QwenConfig,
    token_ids: jax.Array,        # [B, L] right-padded
    lengths: jax.Array,          # [B] total valid length
    score_start: jax.Array,      # [B] first position to score (prompt excluded)
) -> jax.Array:
    """Teacher-forced sum log P(token_t | tokens_<t) over [score_start, length)."""
    b, l = token_ids.shape
    valid = (jnp.arange(l)[None, :] < lengths[:, None]).astype(jnp.int32)
    hidden = qwen.forward(params, cfg, token_ids, valid)
    logits = qwen.lm_logits(params, cfg, hidden).astype(jnp.float32)   # [B, L, V]
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    targets = token_ids[:, 1:]
    tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]  # [B, L-1]
    pos = jnp.arange(l - 1)[None, :]
    # position t in tok_lp predicts token t+1
    mask = (pos + 1 >= score_start[:, None]) & (pos + 1 < lengths[:, None])
    return jnp.sum(tok_lp * mask.astype(jnp.float32), axis=-1)


def pmi_reward(
    params: Dict[str, Any],
    cfg: QwenConfig,
    cond_ids: Sequence[int],
    codes_ids: Sequence[int],
) -> float:
    """reward = log P(cond | codes) - log P(cond) (single sequence)."""
    cond = list(cond_ids)
    codes = list(codes_ids)
    with_ctx = codes + cond
    without_ctx = cond

    max_len = max(len(with_ctx), len(without_ctx))
    def pad(x):
        return x + [0] * (max_len - len(x))

    ids = jnp.asarray([pad(with_ctx), pad(without_ctx)], jnp.int32)
    lengths = jnp.asarray([len(with_ctx), len(without_ctx)], jnp.int32)
    starts = jnp.asarray([len(codes), 0], jnp.int32)
    # score_start 0 would score token 0 given nothing — shift to 1 minimum
    starts = jnp.maximum(starts, 1)
    lp = sequence_logprob(params, cfg, ids, lengths, starts)
    return float(lp[0] - lp[1])


def calculate_reward_scores(
    params: Dict[str, Any],
    cfg: QwenConfig,
    cond_ids: Sequence[int],
    candidates: Sequence[Sequence[int]],
) -> List[float]:
    """PMI reward per candidate code sequence; higher = better match to cond."""
    return [pmi_reward(params, cfg, cond_ids, c) for c in candidates]


def metadata_recall(
    requested: Dict[str, Any], understood: Dict[str, Any], keys: Optional[Sequence[str]] = None
) -> float:
    """Fraction of requested metadata fields the understanding pass recovered
    (test_time_scaling.py:178-260 top-k recall, simplified to exact/contains)."""
    keys = keys or [k for k in ("bpm", "keyscale", "timesignature", "language", "genres")
                    if k in requested]
    if not keys:
        return 1.0
    hit = 0
    for k in keys:
        want = str(requested.get(k, "")).strip().lower()
        got = str(understood.get(k, "")).strip().lower()
        if want and (want == got or (want in got if len(want) > 2 else False)):
            hit += 1
    return hit / len(keys)


def rank_candidates(
    params: Dict[str, Any],
    cfg: QwenConfig,
    cond_ids: Sequence[int],
    candidates: Sequence[Sequence[int]],
) -> List[int]:
    """Indices of candidates sorted best-first by PMI reward."""
    scores = calculate_reward_scores(params, cfg, cond_ids, candidates)
    return list(np.argsort(scores)[::-1])
