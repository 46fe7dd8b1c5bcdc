"""LLaVA-Reward-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for multimodal
reward models, re-designed from scratch with the capabilities of
sjz5202/LLaVA-Reward (ICCV 2025, arXiv:2507.21391).

Scores (prompt, image) pairs with a multimodal-LLM backbone (Phi-3.5-vision,
Qwen2.5-VL, LLaVA-v1.6) augmented with Bradley-Terry / General-Preference /
classification value heads, an optional SkipCA cross-attention adapter, and
LoRA adapters; trains with pairwise preference learning over a
``jax.sharding.Mesh`` (FSDP = ZeRO-3 equivalent) and serves batch reward
scoring with jit-compiled forwards and Pallas attention kernels.
"""

__version__ = "0.1.0"
