from .audio import peak_normalize, read_wav, write_wav
from .safetensors_io import SafetensorsFile, bf16_to_f32, f32_to_bf16_raw, save_safetensors

__all__ = [
    "peak_normalize",
    "read_wav",
    "write_wav",
    "SafetensorsFile",
    "bf16_to_f32",
    "f32_to_bf16_raw",
    "save_safetensors",
]

from .np_cast import np_astype_fast  # noqa: E402
__all__.append("np_astype_fast")
