from .model import RewardBatch, RewardOutput, reward_forward, paired_forward, init_head_params
from .preference import preference_prob
from . import losses, heads, skipca
