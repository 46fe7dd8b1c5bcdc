from .norms import rms_norm, layer_norm
from .activations import ACT2FN, quick_gelu, gelu, silu
from .rope import compute_rope_cos_sin, apply_rotary, rotate_half
from .attention import mha, attention_reference
