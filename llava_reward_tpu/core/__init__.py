from .config import (
    VisionConfig,
    DecoderConfig,
    RopeScalingConfig,
    Phi3VConfig,
    Qwen25VLConfig,
    QwenTextConfig,
    QwenVisionConfig,
    LlavaNextConfig,
    RewardConfig,
    phi35_vision_config,
    phi3v_tiny_config,
    qwen25_vl_7b_config,
    qwen_tiny_config,
    llava_tiny_config,
)
from .registry import get_family
