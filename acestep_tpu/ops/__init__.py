from .nn import (
    apply_rope,
    attention,
    make_attention_mask,
    rms_norm,
    rope_cos_sin,
    silu,
    sinusoidal_timestep_embedding,
)
from .blocked_attention import (
    banded_attention,
    flash_attention,
    use_blocked_attention,
)
from .qlinear import linear, resolve_backend

__all__ = [
    "apply_rope",
    "attention",
    "banded_attention",
    "flash_attention",
    "use_blocked_attention",
    "make_attention_mask",
    "rms_norm",
    "rope_cos_sin",
    "silu",
    "sinusoidal_timestep_embedding",
    "linear",
    "resolve_backend",
]
