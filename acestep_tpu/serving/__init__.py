from . import kv_cache, lm
from .lm import SamplingParams, generate

__all__ = ["kv_cache", "lm", "SamplingParams", "generate"]
