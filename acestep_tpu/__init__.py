"""acestep_tpu — a TPU-native quantized inference engine for the ACE-Step 1.5 music stack.

Built from scratch in JAX/XLA/Pallas.  Capability reference: LLSean/ACE-Step-1.5-ggml
(see SURVEY.md at the repo root for the blueprint).  The compute path is pure JAX with
Pallas MXU kernels for the quantized hot ops; weights live in HBM in GGML-style
weight-only block-quant formats (Q8_0 / Q4_0 / Q4_K tpu layouts).

Subpackages:
  quant     — block-quant formats, QuantTensor pytree, converters
  ops       — quantized linear / attention / norm primitives (XLA + Pallas backends)
  models    — DiT denoiser, Oobleck VAE, Qwen3 text-encoder/LM (pure functional)
  sampler   — flow-matching Euler sampler (jitted scan)
  pipeline  — end-to-end text2music orchestration
  parallel  — device mesh, sharding specs, TP/DP layouts
  utils     — safetensors IO, WAV IO, rng helpers
"""

__version__ = "0.1.0"
