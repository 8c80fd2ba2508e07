"""Continuous batcher tests (fake engine; real threads)."""

import time

import numpy as np
import pytest

from acestep_tpu.pipeline import GenerationRequest, GenerationResult
from acestep_tpu.serving.batcher import (
    ContinuousBatcher,
    _shape_key,
    merge_requests,
    split_result,
)


def _req(dur=10.0, style_len=6, lyric_len=None, seeds=None, batch=1):
    rng = np.random.default_rng(0)
    return GenerationRequest(
        duration_s=dur,
        style_token_ids=rng.integers(0, 100, (1, style_len)),
        lyric_token_ids=rng.integers(0, 100, (1, lyric_len)) if lyric_len else None,
        seeds=seeds or [1],
        batch_size=batch,
    )


class TestMerge:
    def test_shape_key_groups_same_bucket(self):
        assert _shape_key(_req(dur=10.0)) == _shape_key(_req(dur=10.2))
        # 10 s and 30 s land in different frame buckets
        assert _shape_key(_req(dur=10.0)) != _shape_key(_req(dur=30.0))
        # 20 and 260 style tokens land in different token buckets
        assert _shape_key(_req(style_len=20)) != _shape_key(_req(style_len=260))

    def test_merge_concatenates(self):
        a = _req(dur=10.0, seeds=[1])
        b = _req(dur=8.0, seeds=[2])        # clamps to 10 s -> same bucket
        m = merge_requests([a, b])
        assert m.batch_size == 2
        assert m.seeds == [1, 2]
        assert m.style_token_ids.shape[0] == 2
        assert len(m.durations_s) == 2

    def test_merge_different_lyric_lengths_same_bucket(self):
        a = _req(lyric_len=9)
        b = _req(lyric_len=3)                # both bucket to 32 tokens
        m = merge_requests([a, b])
        assert m.lyric_token_ids.shape[0] == 2
        assert m.lyric_mask[0].sum() == 9 and m.lyric_mask[1].sum() == 3

    def test_merge_rejects_incompatible(self):
        import dataclasses

        # mixed lyric presence is mergeable (zero-mask fill); a semantic knob
        # like infer_steps that merge_requests copies from reqs[0] is not
        with pytest.raises(AssertionError):
            merge_requests([_req(), dataclasses.replace(_req(), infer_steps=20)])

    def test_split_result(self):
        res = GenerationResult(
            audio=np.zeros((3, 100, 2)), latents=np.zeros((3, 10, 4)),
            sample_rate=48000, time_costs={}, seeds=[1, 2, 3],
            audio_lengths=[100, 80, 60],
        )
        parts = split_result(res, [1, 2])
        assert parts[0].audio.shape[0] == 1 and parts[1].audio.shape[0] == 2
        assert parts[1].seeds == [2, 3]
        assert parts[1].audio_lengths == [80, 60]


class TestBatcher:
    def test_batches_compatible_requests(self):
        calls = []

        def run(req):
            calls.append(req.batch_size)
            time.sleep(0.02)
            b = req.batch_size
            return GenerationResult(
                audio=np.zeros((b, 10, 2)), latents=np.zeros((b, 5, 4)),
                sample_rate=48000, time_costs={}, seeds=list(req.seeds),
                audio_lengths=[10] * b,
            )

        batcher = ContinuousBatcher(run, max_batch=4, max_wait_s=0.15).start()
        try:
            futs = [batcher.submit(_req(seeds=[i])) for i in range(4)]
            results = [f.result(timeout=5) for f in futs]
            assert all(r.audio.shape[0] == 1 for r in results)
            assert [r.seeds for r in results] == [[0], [1], [2], [3]]
            # the four compatible requests merged into at most 2 launches
            assert len(calls) <= 2
            assert sum(calls) == 4
        finally:
            batcher.stop()

    def test_incompatible_requests_run_separately(self):
        keys = []

        def run(req):
            keys.append(req.duration_s)
            b = req.batch_size
            return GenerationResult(
                audio=np.zeros((b, 10, 2)), latents=np.zeros((b, 5, 4)),
                sample_rate=48000, time_costs={}, seeds=list(req.seeds or [0] * b),
                audio_lengths=[10] * b,
            )

        batcher = ContinuousBatcher(run, max_batch=4, max_wait_s=0.05).start()
        try:
            f1 = batcher.submit(_req(dur=10.0))
            f2 = batcher.submit(_req(dur=60.0))
            f1.result(timeout=5)
            f2.result(timeout=5)
            assert len(keys) == 2
        finally:
            batcher.stop()

    def test_error_propagates(self):
        def run(req):
            raise RuntimeError("engine exploded")

        batcher = ContinuousBatcher(run, max_batch=2, max_wait_s=0.05).start()
        try:
            f = batcher.submit(_req())
            with pytest.raises(RuntimeError, match="exploded"):
                f.result(timeout=5)
        finally:
            batcher.stop()


def test_engine_backed_mixed_duration_batch():
    """configs[3] precursor: two different durations sharing one frame bucket
    merge into one ENGINE batch and come back with per-item valid lengths."""
    import jax
    import jax.numpy as jnp

    from acestep_tpu.serving.batcher import ContinuousBatcher
    from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT
    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.vae as vae_mod
    import acestep_tpu.models.qwen as qwen_mod
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    engine = AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )
    batcher = ContinuousBatcher(engine.generate, max_batch=4, max_wait_s=0.5)
    batcher.start()
    try:
        rng = np.random.default_rng(0)
        style = rng.integers(0, 256, (1, 6))
        # 10.0s and 10.1s share the 256-frame bucket -> mergeable
        f1 = batcher.submit(GenerationRequest(
            duration_s=10.0, style_token_ids=style, seeds=[1]))
        f2 = batcher.submit(GenerationRequest(
            duration_s=10.1, style_token_ids=style, seeds=[2]))
        r1 = f1.result(timeout=300)
        r2 = f2.result(timeout=300)
    finally:
        batcher.stop()
    assert batcher.stats["batches"] >= 1
    assert max(batcher.stats["merged_sizes"]) == 2        # actually merged
    hop = TINY_VAE.hop_length
    assert r1.audio_lengths[0] == int(round(10.0 * 25)) * hop
    assert r2.audio_lengths[0] == int(round(10.1 * 25)) * hop
    assert np.isfinite(r1.audio).all() and np.isfinite(r2.audio).all()


def test_priority_preempts_queued_work():
    """A high-priority request scheduled after low-priority ones runs first."""
    import threading
    import time as _time
    from acestep_tpu.serving.batcher import ContinuousBatcher
    from acestep_tpu.pipeline import GenerationRequest, GenerationResult

    order = []
    gate = threading.Event()

    def run_fn(req):
        if not gate.is_set():          # block the first batch until all queued
            gate.wait(timeout=5)
        order.append(req.duration_s)
        b = req.batch_size
        return GenerationResult(
            audio=np.zeros((b, 10, 2), np.float32),
            latents=np.zeros((b, 4, 8), np.float32),
            sample_rate=48000, time_costs={}, seeds=[0] * b,
            audio_lengths=[10] * b)

    batcher = ContinuousBatcher(run_fn, max_batch=1, max_wait_s=0.05)
    batcher.start()
    try:
        f1 = batcher.submit(GenerationRequest(duration_s=11.0))   # runs first (blocks)
        _time.sleep(0.15)
        f2 = batcher.submit(GenerationRequest(duration_s=12.0), priority=0)
        f3 = batcher.submit(GenerationRequest(duration_s=13.0), priority=5)
        _time.sleep(0.1)
        gate.set()
        for f in (f1, f2, f3):
            f.result(timeout=10)
    finally:
        batcher.stop()
    # 13s (high priority) must run before 12s despite arriving later
    assert order.index(13.0) < order.index(12.0)


class TestCrossBucketMerge:
    def _run_fn(self, calls):
        def run(req):
            calls.append((req.batch_size, req.duration_s))
            b = req.batch_size
            return GenerationResult(
                audio=np.zeros((b, 10, 2)), latents=np.zeros((b, 5, 4)),
                sample_rate=48000, time_costs={}, seeds=list(req.seeds or [0] * b),
                audio_lengths=[10] * b,
            )
        return run

    def test_pad_up_merges_across_frame_buckets(self):
        """10s and 20s requests merge into ONE dispatch at the 20s bucket
        (spread 2.0 <= pad_ratio); per-item durations ride durations_s."""
        calls = []
        batcher = ContinuousBatcher(self._run_fn(calls), max_batch=4,
                                    max_wait_s=0.1, pad_ratio=2.5).start()
        try:
            f1 = batcher.submit(_req(dur=10.0, seeds=[1]))
            f2 = batcher.submit(_req(dur=20.0, seeds=[2]))
            f1.result(timeout=5), f2.result(timeout=5)
        finally:
            batcher.stop()
        assert len(calls) == 1 and calls[0] == (2, 20.0)
        assert batcher.stats["padded_items"] == 1
        s = batcher.stats_summary()
        assert s["avg_merged_batch"] == 2.0 and s["requests"] == 2

    def test_pad_ratio_limits_spread(self):
        """10s and 60s stay separate (spread ~6 > pad_ratio 2.5)."""
        calls = []
        batcher = ContinuousBatcher(self._run_fn(calls), max_batch=4,
                                    max_wait_s=0.05, pad_ratio=2.5).start()
        try:
            f1 = batcher.submit(_req(dur=10.0))
            f2 = batcher.submit(_req(dur=60.0))
            f1.result(timeout=5), f2.result(timeout=5)
        finally:
            batcher.stop()
        assert len(calls) == 2

    def test_admission_caps_merged_batch(self):
        """max_batch_for (the HBM plan hook) bounds merge growth per frame
        bucket: at a cap of 2 for the big bucket, four compatible requests
        [10s, 20s, 20s, 20s] must NOT all merge into one b=4 dispatch — the
        engine's clamp would truncate the merged request (configs[3] failure
        mode: a b=5@1536 merge clamped to 4 then OOM in the VAE)."""
        calls = []
        caps = {256: 8, 512: 2}
        batcher = ContinuousBatcher(
            self._run_fn(calls), max_batch=8, max_wait_s=0.1, pad_ratio=2.5,
            max_batch_for=lambda frames: caps.get(frames, 1),
        ).start()
        try:
            futs = [batcher.submit(_req(dur=d, seeds=[i]))
                    for i, d in enumerate([10.0, 20.0, 20.0, 20.0])]
            for f in futs:
                f.result(timeout=5)
        finally:
            batcher.stop()
        # every dispatch at the 512-frame bucket respects the cap of 2
        assert all(b <= 2 for b, _ in calls), calls
        assert sum(b for b, _ in calls) == 4

    def test_batch_size_mismatch_fails_loudly(self):
        """A run_fn that returns fewer items than the merged batch (an engine
        batch clamp) must fail every future instead of mis-splitting rows."""
        def run(req):
            b = req.batch_size - 1          # simulate the engine's clamp
            return GenerationResult(
                audio=np.zeros((b, 40, 2), np.float32),
                latents=np.zeros((b, 4, 8), np.float32),
                sample_rate=48000,
                time_costs={}, seeds=list(range(b)), audio_lengths=[10] * b,
            )

        batcher = ContinuousBatcher(run, max_batch=4, max_wait_s=0.1).start()
        try:
            f1 = batcher.submit(_req(dur=10.0, seeds=[1]))
            f2 = batcher.submit(_req(dur=10.0, seeds=[2]))
            with pytest.raises(RuntimeError, match="merged batch"):
                f1.result(timeout=5)
            with pytest.raises(RuntimeError, match="merged batch"):
                f2.result(timeout=5)
        finally:
            batcher.stop()

    def test_merge_key_separates_semantic_knobs(self):
        """Different infer_steps / guidance must NOT merge (they change the
        compiled schedule / guidance math merge_requests copies from reqs[0])."""
        import dataclasses

        a = _req(dur=10.0)
        b = dataclasses.replace(_req(dur=10.0), infer_steps=20)
        c = dataclasses.replace(_req(dur=10.0), guidance_scale=3.0)
        from acestep_tpu.serving.batcher import _merge_key

        assert _merge_key(a) != _merge_key(b)
        assert _merge_key(a) != _merge_key(c)
        with pytest.raises(AssertionError):
            merge_requests([a, b])

    def test_engine_backed_cross_bucket(self):
        """Two different frame buckets through the REAL tiny engine in one
        merged batch: per-item audio lengths stay exact."""
        import jax
        import jax.numpy as jnp

        from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT
        import acestep_tpu.models.dit as dit_mod
        import acestep_tpu.models.vae as vae_mod
        import acestep_tpu.models.qwen as qwen_mod
        from acestep_tpu.pipeline import AceStepEngine, GenerationRequest

        k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
        engine = AceStepEngine(
            dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
            vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
            qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
        )
        batcher = ContinuousBatcher(engine.generate, max_batch=4,
                                    max_wait_s=0.5, pad_ratio=2.5)
        batcher.start()
        try:
            rng = np.random.default_rng(0)
            style = rng.integers(0, 256, (1, 6))
            f1 = batcher.submit(GenerationRequest(
                duration_s=10.0, style_token_ids=style, seeds=[1]))
            f2 = batcher.submit(GenerationRequest(
                duration_s=20.0, style_token_ids=style, seeds=[2]))
            r1 = f1.result(timeout=300)
            r2 = f2.result(timeout=300)
        finally:
            batcher.stop()
        assert max(batcher.stats["merged_sizes"]) == 2
        hop = TINY_VAE.hop_length
        assert r1.audio_lengths[0] == int(round(10.0 * 25)) * hop
        assert r2.audio_lengths[0] == int(round(20.0 * 25)) * hop
        assert np.isfinite(r1.audio).all() and np.isfinite(r2.audio).all()
