from .masks import MaskSpec, mask_allowed, materialize_mask
from .attention import dot_product_attention
from .quantization import dequantize_array, int8_matmul, quantize_array, quantize_tree
