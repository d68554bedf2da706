from .masks import MaskSpec, mask_allowed, materialize_mask
from .attention import dot_product_attention
