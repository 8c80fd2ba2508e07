"""PMI reward / test-time scaling tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu import scoring
from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen

TINY = QwenConfig(
    vocab_size=128, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128, head_dim=16,
)


@pytest.fixture(scope="module")
def params():
    return qwen.init_params(jax.random.key(0), TINY, dtype=jnp.float32, scale=0.1)


def test_sequence_logprob_matches_manual(params):
    ids = jnp.asarray([[5, 9, 3, 7, 2, 0, 0]], jnp.int32)
    lengths = jnp.asarray([5], jnp.int32)
    starts = jnp.asarray([2], jnp.int32)
    lp = float(scoring.sequence_logprob(params, TINY, ids, lengths, starts)[0])

    # manual: forward unpadded, sum logprob of tokens at positions 2..4
    h = qwen.forward(params, TINY, ids[:, :5])
    logits = np.asarray(qwen.lm_logits(params, TINY, h), dtype=np.float64)[0]
    manual = 0.0
    for t in (2, 3, 4):
        row = logits[t - 1]
        row = row - row.max()
        p = np.exp(row) / np.exp(row).sum()
        manual += np.log(p[int(ids[0, t])])
    assert abs(lp - manual) < 1e-3


def test_pmi_prefers_self_consistent_codes(params):
    """The PMI of cond given a context that repeats cond's own tokens should beat
    an unrelated context (the LM, even random-init, conditions on context)."""
    cond = [10, 11, 12, 13]
    codes_related = [10, 11, 12, 13, 10, 11]
    codes_unrelated = [90, 91, 92, 93, 94, 95]
    r_rel = scoring.pmi_reward(params, TINY, cond, codes_related)
    r_unrel = scoring.pmi_reward(params, TINY, cond, codes_unrelated)
    # both are finite; ranking works end-to-end
    assert np.isfinite(r_rel) and np.isfinite(r_unrel)
    order = scoring.rank_candidates(params, TINY, cond, [codes_related, codes_unrelated])
    assert sorted(order) == [0, 1]


def test_metadata_recall():
    req = {"bpm": 120, "keyscale": "G major", "language": "en"}
    got_all = {"bpm": "120", "keyscale": "g major", "language": "EN"}
    assert scoring.metadata_recall(req, got_all) == 1.0
    got_half = {"bpm": "99", "keyscale": "G major", "language": "en"}
    assert abs(scoring.metadata_recall(req, got_half) - 2 / 3) < 1e-9
    assert scoring.metadata_recall({}, {}) == 1.0
