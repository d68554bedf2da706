from .model import (
    CLIP,
    CONFIGS,
    IMAGE_MEAN,
    IMAGE_RESOLUTION,
    IMAGE_STD,
    MAX_TEXT_LENGTH,
    MODELS,
    load_model_vars,
    normalize_image,
    unnormalize_image,
)
from .convert import convert_torch_clip_vars
from .tokenizer import build_tokenizer, tokenize
