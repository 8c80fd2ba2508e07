"""Server entry point: wire an engine + LM into the REST / OpenRouter servers.

Usage:
    python -m acestep_tpu.serving.launch api        [--port 8000] [--checkpoint DIR]
    python -m acestep_tpu.serving.launch openrouter [--port 8001] [--checkpoint DIR]

Without --checkpoint a random-weight engine is built (smoke/demo mode).  The
payload schema matches the studio UI / reference release_task params
(api_server.py:849-895 alias parsing, simplified).
"""

from __future__ import annotations

import argparse
import base64
import io
import os
import sys
import time
from typing import Any, Dict, Optional


def build_engine(checkpoint: Optional[str], quant: str):
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from acestep_tpu import loader
    from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
    from acestep_tpu.pipeline import AceStepEngine, build_random_engine

    if checkpoint:
        import json

        def load_cfg(name, cls):
            # tools/convert_checkpoint.py writes <name>.config.json next to
            # the converted weights; fall back to flagship defaults
            p = os.path.join(checkpoint, f"{name}.config.json")
            if os.path.exists(p):
                with open(p) as f:
                    return cls.from_dict(json.load(f))
            return cls()

        dit_params = loader.load_params(os.path.join(checkpoint, "dit"))
        engine = AceStepEngine(
            dit_params, load_cfg("dit", DiTConfig),
            loader.load_params(os.path.join(checkpoint, "vae")),
            load_cfg("vae", VAEConfig),
            loader.load_params(os.path.join(checkpoint, "text_encoder")),
            load_cfg("text_encoder", QwenConfig),
        )
        return engine, dit_params
    eng = build_random_engine(jax.random.key(0), quant=None if quant == "bf16" else quant)
    return eng, None


def build_lm(checkpoint: Optional[str]):
    """LMPipeline from a converted checkpoint's lm/ component + tokenizer.json
    (tools/convert_checkpoint.py --lm output).  None when the checkpoint has
    no LM — the server then runs the engine-only fn, like the reference with
    lm_model_path unset."""
    if not checkpoint:
        return None
    import json

    from acestep_tpu import loader
    from acestep_tpu.config import QwenConfig
    from acestep_tpu.lm_pipeline import LMPipeline, TokenizerJsonAdapter

    lm_dir = os.path.join(checkpoint, "lm")
    tok_path = os.path.join(checkpoint, "tokenizer.json")
    if not os.path.exists(lm_dir + ".safetensors") or not os.path.exists(tok_path):
        return None
    cfg_path = os.path.join(checkpoint, "lm.config.json")
    with open(cfg_path) as f:
        cfg = QwenConfig.from_dict(json.load(f))
    return LMPipeline(loader.load_params(lm_dir), cfg,
                      TokenizerJsonAdapter(tok_path))


def build_codec(checkpoint: Optional[str]):
    """Codec bridge params from a converted checkpoint's codec/ component
    (tools/convert_checkpoint.py probe path).  Falls back to the structural
    random-weight bridge when the checkpoint carries none — LM code hints then
    stay OFF unless explicitly enabled, matching a reference install whose
    remote code is absent."""
    if not checkpoint:
        return None
    from acestep_tpu import loader

    codec_dir = os.path.join(checkpoint, "codec")
    if not os.path.exists(codec_dir + ".safetensors"):
        return None
    return loader.load_params(codec_dir)


def _decode_audio_payload(b64: str, fmt: str = ""):
    """base64 (or data-URL) audio -> [L, C] float32.  WAV and FLAC decode
    natively (utils.audio / utils.flac), MP3 through the libmpg123 binding
    (utils.mp3); the format is sniffed from magic bytes when not given."""
    import numpy as np

    if b64.startswith("data:"):
        b64 = b64.split(",", 1)[1]
    data = base64.b64decode(b64)
    fmt = (fmt or "").lower()
    if not fmt:
        if data[:4] == b"fLaC":
            fmt = "flac"
        elif data[:3] == b"ID3" or (len(data) > 1 and data[0] == 0xFF
                                    and (data[1] & 0xE0) == 0xE0):
            fmt = "mp3"
        else:
            fmt = "wav"
    if fmt == "flac":
        from acestep_tpu.utils.flac import decode_flac

        audio, _sr = decode_flac(data)
        return np.asarray(audio, np.float32)
    if fmt == "mp3":
        from acestep_tpu.utils import mp3 as _mp3

        if not _mp3.decoder_available():
            raise ValueError(
                "mp3 upload received but libmpg123 is not available on this "
                "host — upload wav or flac instead")
        audio, _sr = _mp3.decode_mp3_bytes(data)
        return np.asarray(audio, np.float32)
    from acestep_tpu.utils.audio import read_wav_bytes

    audio, _sr = read_wav_bytes(data)
    return audio


def _parse_audio_inputs(p, payload, engine, req_kwargs: Dict[str, Any]) -> None:
    """Fill src_latents / refer_latents / repaint span from upload fields
    (reference gradio events/generate.py: audio upload -> src audio for
    repaint/cover/extract, reference audio -> timbre)."""
    import numpy as np

    src_b64 = p.str("src_audio_base64") or p.str("source_audio_base64")
    if src_b64:
        audio = _decode_audio_payload(src_b64, p.str("src_audio_format"))
        req_kwargs["src_latents"] = engine.encode_src_audio(audio)
        # default the duration to the source length for src-conditioned tasks
        if not payload.get("duration") and not payload.get("audioDuration"):
            hop = engine.vae_cfg.hop_length
            rate = engine.vae_cfg.sampling_rate
            req_kwargs["duration_s"] = audio.shape[0] // hop * hop / rate
    ref_b64 = p.str("refer_audio_base64") or p.str("reference_audio_base64")
    if ref_b64:
        audio = _decode_audio_payload(ref_b64, p.str("refer_audio_format"))
        req_kwargs["refer_latents"] = engine.encode_refer_audio([audio])
        req_kwargs["refer_mask"] = np.ones(
            req_kwargs["refer_latents"].shape[:2], np.int32)
    if payload.get("repaint_start") is not None:
        req_kwargs["repaint_start_s"] = p.float("repaint_start", 0.0)
    if payload.get("repaint_end") is not None:
        req_kwargs["repaint_end_s"] = p.float("repaint_end", -1.0)
    if p.str("track_name"):
        req_kwargs["track_name"] = p.str("track_name")


def make_generate_fn(engine, tokenizer=None):
    """payload dict -> result dict (audio base64 + metadata + timings)."""
    import numpy as np

    from acestep_tpu.pipeline import GenerationRequest

    def tokenize(text: str, cap: int):
        if tokenizer is not None:
            ids = tokenizer.encode(text)[:cap]
            return np.asarray([ids], np.int32) if ids else None
        if not text:
            return None
        # demo-mode fallback: byte-level ids (real deployments pass a tokenizer)
        ids = [b % 32000 for b in text.encode()][:cap]
        return np.asarray([ids], np.int32)

    def generate(payload: Dict[str, Any]) -> Dict[str, Any]:
        from acestep_tpu.serving.api_server import RequestParser
        from acestep_tpu.utils.flac import encode_flac

        p = RequestParser(payload)
        caption = p.str("caption")
        lyrics = p.str("lyrics")
        lyric_ids = tokenize(lyrics, 2048)
        req_kwargs: Dict[str, Any] = dict(
            duration_s=p.float("duration", 30.0),
            style_token_ids=tokenize(caption, 256),
            lyric_token_ids=lyric_ids,
            task=p.str("task_type", "text2music"),
            seeds=[p.int("seed", 0)],
            shift=p.float("shift", 3.0) if payload.get("shift") else 3.0,
            infer_method=p.str("infer_method", "ode"),
            batch_size=p.int("batch_size", 1),
            audio_cover_strength=p.float("audio_cover_strength", 1.0),
            guidance_scale=p.float("guidance_scale", 1.0),
            infer_steps=p.int("inference_steps", 8),
            use_adg=p.bool("use_adg"),
        )
        _parse_audio_inputs(p, payload, engine, req_kwargs)
        req = GenerationRequest(**req_kwargs)
        res = engine.generate(req)
        # already peak-normalized 16-bit PCM from the device (audio_utils.py:24
        # semantics); segments pass through without host reassembly
        segments = [s[0] for s in res.pcm16_segments()]
        fmt = p.str("audio_format", "wav").lower()
        if fmt == "mp3":
            from acestep_tpu.utils import mp3 as _mp3

            if _mp3.encoder_available():
                audio = (segments[0] if len(segments) == 1
                         else np.concatenate(segments, axis=0))
                audio_b64 = base64.b64encode(
                    _mp3.encode_mp3(audio, res.sample_rate)).decode()
            else:
                fmt = "wav"                     # AudioSaver's fallback ladder
        if fmt == "flac":
            audio = segments[0] if len(segments) == 1 else np.concatenate(segments, axis=0)
            audio_b64 = base64.b64encode(encode_flac(audio, res.sample_rate)).decode()
        elif fmt != "mp3":
            from acestep_tpu.utils.audio import wav_bytes

            fmt = "wav"
            audio_b64 = base64.b64encode(wav_bytes(segments, res.sample_rate)).decode()
        out = {
            "audio_base64": audio_b64,
            "audio_format": fmt,
            "sample_rate": res.sample_rate,
            "metadata": {k: p.get(k) for k in
                         ("caption", "bpm", "duration", "keyscale") if p.get(k)},
            "time_costs": {k: round(v, 3) for k, v in res.time_costs.items()},
            "seeds": res.seeds,
        }
        # optional lyric alignment (handler.py:3792 get_lyric_timestamp surface)
        if p.bool("return_lrc") and lyric_ids is not None:
            lines = [ln for ln in lyrics.split("\n") if ln.strip()]
            n_ids = int(lyric_ids.shape[1])
            per = max(1, n_ids // max(1, len(lines)))
            counts = [per] * len(lines)
            counts[-1] = n_ids - per * (len(lines) - 1)
            stamps, lrc = engine.get_lyric_timestamps(
                res.latents, req, lyric_lines=lines, line_token_counts=counts)
            out["lrc"] = lrc
            out["lyric_timestamps"] = [round(float(s), 3) for s in stamps]
            out["lyric_score"] = float(engine.get_lyric_score(res.latents, req))
        return out

    return generate


def make_full_generate_fn(engine, lm, codec_params=None, tokenizer=None):
    """payload dict -> result dict through the FULL pipeline
    (inference.generate_music): LM CoT+codes phase -> metadata merge ->
    code-hints -> DiT -> decode.  Mirrors the reference API server's param
    block (api_server.py:2280-2315: lm_temperature/lm_cfg_scale/lm_top_k/
    lm_top_p/constrained_decoding/thinking) plus the per-phase temperature
    knobs (llm_inference.py:199-233)."""
    import base64 as _b64

    import numpy as np

    from acestep_tpu.inference import (GenerationConfig, GenerationParams,
                                       generate_music)

    tok = tokenizer if tokenizer is not None else getattr(lm, "tok", None)

    def tokenize(text: str, cap: int):
        if not text:
            return None
        if tok is not None:
            ids = tok.encode(text)[:cap]
            return np.asarray([ids], np.int32) if ids else None
        ids = [b % 32000 for b in text.encode()][:cap]
        return np.asarray([ids], np.int32)

    def generate(payload: Dict[str, Any]) -> Dict[str, Any]:
        from acestep_tpu.serving.api_server import RequestParser
        from acestep_tpu.utils.audio import wav_bytes

        p = RequestParser(payload)
        caption, lyrics = p.str("caption"), p.str("lyrics")
        params = GenerationParams(
            caption=caption,
            lyrics=lyrics,
            bpm=p.int("bpm") or None,
            keyscale=p.str("keyscale"),
            timesignature=p.str("timesignature"),
            duration=p.float("duration", -1.0),
            language=p.str("language"),
            task_type=p.str("task_type", "text2music"),
            thinking=p.bool("thinking", True),
            lm_temperature=p.float("lm_temperature", 0.85),
            lm_metadata_temperature=p.float("lm_metadata_temperature"),
            lm_codes_temperature=p.float("lm_codes_temperature"),
            lm_top_p=p.float("lm_top_p", 0.95),
            lm_top_k=p.int("lm_top_k", 0),
            lm_cfg_scale=p.float("lm_cfg_scale", 1.0),
            lm_negative_prompt=p.str("lm_negative_prompt", "NO USER INPUT"),
            lm_num_candidates=p.int("lm_num_candidates", 1),
            lm_constrained_cot=p.bool("constrained_decoding", True),
            inference_steps=p.int("inference_steps", 8),
            shift=p.float("shift", 3.0),
            infer_method=p.str("infer_method", "ode"),
            audio_cover_strength=p.float("audio_cover_strength", 1.0),
            style_token_ids=tokenize(caption, 256),
            lyric_token_ids=tokenize(lyrics, 2048),
        )
        # audio uploads -> pre-encoded latents (same fields the engine-only fn
        # takes; GenerationParams uses repaint_start/_end without the _s)
        audio_kwargs: Dict[str, Any] = {}
        _parse_audio_inputs(p, payload, engine, audio_kwargs)
        if "src_latents" in audio_kwargs:
            params.src_latents = audio_kwargs["src_latents"]
        if "refer_latents" in audio_kwargs:
            params.refer_latents = audio_kwargs["refer_latents"]
        if "repaint_start_s" in audio_kwargs:
            params.repaint_start = audio_kwargs["repaint_start_s"]
        if "repaint_end_s" in audio_kwargs:
            params.repaint_end = audio_kwargs["repaint_end_s"]
        if "track_name" in audio_kwargs:
            params.track_name = audio_kwargs["track_name"]
        if "duration_s" in audio_kwargs and params.duration < 0:
            params.duration = audio_kwargs["duration_s"]
        config = GenerationConfig(
            batch_size=p.int("batch_size", 1),
            seeds=[p.int("seed", 0)],
            lm_batch_chunk_size=p.int("lm_batch_chunk_size", 4),
        )
        res = generate_music(engine, lm, params, config,
                             codec_params=codec_params)
        segments = [s[0] for s in res.dit_result.pcm16_segments()]
        return {
            "audio_base64": _b64.b64encode(
                wav_bytes(segments, res.sample_rate)).decode(),
            "audio_format": "wav",
            "sample_rate": res.sample_rate,
            "metadata": res.metadata,
            "cot_text": res.lm_result.cot_text if res.lm_result else "",
            "time_costs": {k: round(v, 3) for k, v in res.time_costs.items()},
            "seeds": res.seeds,
        }

    return generate


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["api", "openrouter"])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--quant", default=os.environ.get("ACESTEP_TPU_QUANT", "q8_0"))
    args = ap.parse_args(argv)

    print(f"building engine (quant={args.quant}, checkpoint={args.checkpoint})...",
          file=sys.stderr)
    engine, dit_base_params = build_engine(args.checkpoint, args.quant)
    lm = build_lm(args.checkpoint)
    generate = (make_full_generate_fn(engine, lm,
                                      codec_params=build_codec(args.checkpoint))
                if lm is not None else make_generate_fn(engine))

    if args.mode == "api":
        from acestep_tpu.serving.api_server import ApiServer
        from acestep_tpu.serving.training_manager import TrainingManager

        lora_rt = None
        if dit_base_params is not None:
            # adapters merge against the UNSTACKED checkpoint tree; demo mode
            # (random weights) has no such tree, so the LoRA tab stays off
            from acestep_tpu.lora_runtime import LoRARuntime

            lora_rt = LoRARuntime(engine, dit_base_params)
        from acestep_tpu.serving.dataset_manager import DatasetManager

        import secrets

        def _fresh_seed_wrap(fn):
            # the reference inspiration flow samples stochastically per call;
            # a fixed default seed would make repeated Inspire clicks return
            # the identical sample
            return lambda text: fn(text, seed=secrets.randbelow(2**31))

        srv = ApiServer(generate,
                        # LM inspiration/rewrite flows behind the studio's
                        # Inspire / Format buttons (reference api_server.py
                        # /create_random_sample + /format_input)
                        create_sample_fn=(_fresh_seed_wrap(lm.create_sample_from_query)
                                          if lm is not None else None),
                        format_input_fn=(_fresh_seed_wrap(lm.format_sample_from_input)
                                         if lm is not None else None),
                        lora_runtime=lora_rt,
                        training_manager=TrainingManager(),
                        dataset_manager=DatasetManager(
                            engine, lm=lm,
                            codec_params=build_codec(args.checkpoint)))
        port = srv.start(args.host, args.port or 8000)
        print(f"API + studio at http://{args.host}:{port}/  (POST /release_task)")
    else:
        from acestep_tpu.serving.openrouter_server import OpenRouterServer

        def or_generate(parsed):
            out = generate({**parsed["metadata"], "caption": parsed["caption"],
                            "lyrics": parsed["lyrics"]})
            import numpy as np

            audio = base64.b64decode(out["audio_base64"])
            from acestep_tpu.utils.audio import read_wav
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                f.write(audio)
                p = f.name
            arr, sr = read_wav(p)
            os.unlink(p)
            return {"audio": arr, "sample_rate": sr, "metadata": out["metadata"]}

        srv = OpenRouterServer(or_generate)
        port = srv.start(args.host, args.port or 8001)
        print(f"OpenRouter API at http://{args.host}:{port}/v1/chat/completions")

    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
