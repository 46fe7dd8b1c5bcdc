from .config import (
    VisionConfig,
    DecoderConfig,
    RopeScalingConfig,
    Phi3VConfig,
    RewardConfig,
    phi35_vision_config,
    phi3v_tiny_config,
)
