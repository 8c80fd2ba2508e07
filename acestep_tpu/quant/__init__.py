from .formats import (
    ALL_FORMATS,
    BLOCK,
    QUANT_FORMATS,
    SUPER,
    QuantTensor,
    dequantize,
    dequantize_np,
    quantize_np,
    quantize_q4_0_np,
    quantize_q4_k_np,
    quantize_q6_k_np,
    quantize_q8_0_np,
    supported_format_for,
)

__all__ = [
    "ALL_FORMATS",
    "BLOCK",
    "QUANT_FORMATS",
    "SUPER",
    "QuantTensor",
    "dequantize",
    "dequantize_np",
    "quantize_np",
    "quantize_q4_0_np",
    "quantize_q4_k_np",
    "quantize_q6_k_np",
    "quantize_q8_0_np",
    "supported_format_for",
]

from .convert import default_policy, quantize_tree, tree_nbytes  # noqa: E402

__all__ += ["default_policy", "quantize_tree", "tree_nbytes"]

from .jax_quant import quantize_jax, quantize_tree_jax  # noqa: E402

__all__ += ["quantize_jax", "quantize_tree_jax"]
