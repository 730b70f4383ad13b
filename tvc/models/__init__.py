from tvc.models.clip import (  # noqa: F401
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    CLIPConfig,
    CLIPModel,
    CLIPModule,
    normalize_pixels,
    preprocess_images,
)
from tvc.models.qwen import QwenConfig, QwenModel  # noqa: F401
from tvc.models.sd import SDConfig, StableDiffusionModel  # noqa: F401
from tvc.models.tokenizer import BPETokenizer, HashTokenizer, get_tokenizer  # noqa: F401
