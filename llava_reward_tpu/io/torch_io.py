"""Torch-side checkpoint IO (host only; never on the TPU compute path).

Reads/writes the reference's on-disk formats: sharded/single
``pytorch_model*.bin`` (torch.save zip) and ``*.safetensors``. torch runs
CPU-only here purely as a (de)serialiser.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Optional

import numpy as np


class TrackedStateDict(dict):
    """State dict that records reads, so loaders can report unconsumed keys.

    The reference relies on torch's strict ``load_state_dict`` semantics
    (eval/reward_adaptor_loader.py:46-63); in zero-egress environments the
    first real-weights load must be a diagnosis, not a silent numerics bug —
    a missing key raises with context, and ``check_fully_consumed`` flags
    keys the loader never read."""

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed: set = set()

    def __getitem__(self, k):
        try:
            v = super().__getitem__(k)
        except KeyError:
            raise KeyError(
                f"state dict is missing required key {k!r} (checkpoint/config "
                "mismatch: verify the base checkpoint matches the model config)"
            ) from None
        self.consumed.add(k)
        return v


# buffers some transformers versions persist but no loader consumes
_IGNORE_PATTERNS = (
    r"\.rotary_emb\.inv_freq$",
    r"\.position_ids$",
    r"\.masked_bias$",
)

# reward-head keys owned by io/artifact.py, not the backbone loaders: in the
# ft-phi full-checkpoint mode (batch_inference_rm_ft_phi.py:28-55) they live
# in the SAME pytorch_model.bin as the base weights, so the base-checkpoint
# strict check must not flag them as unconsumed (a genuine base checkpoint
# never contains them, so ignoring costs no strictness there).
REWARD_HEAD_PATTERNS = (
    r"(^|\.)value_head\.",
    r"(^|\.)W_q\.",
    r"(^|\.)W_k\.",
    r"(^|\.)W_v\.",
    r"(^|\.)ca_layernorm\.",
    r"(^|\.)prompt_head\.",
)


def check_fully_consumed(sd, *, strict: bool = True, what: str = "checkpoint",
                         ignore: tuple = ()) -> list:
    """Report state-dict keys the loader never read (key drift silently drops
    weights). ``strict=True`` raises; otherwise logs a warning. Returns the
    unconsumed keys."""
    import re

    if not isinstance(sd, TrackedStateDict):
        return []
    pats = [re.compile(p) for p in _IGNORE_PATTERNS + tuple(ignore)]
    extra = sorted(
        k for k in sd
        if k not in sd.consumed and not any(p.search(k) for p in pats)
    )
    if not extra:
        return []
    shown = ", ".join(extra[:12]) + (" ..." if len(extra) > 12 else "")
    msg = (
        f"{len(extra)} unconsumed key(s) loading {what}: [{shown}] — these "
        "weights would be silently dropped. Pass strict=False to downgrade "
        "this to a warning."
    )
    if strict:
        raise ValueError(msg)
    from ..core.logging import init_logger

    init_logger(__name__).warning(msg)
    return extra


def _to_numpy(t) -> np.ndarray:
    import torch

    if t.dtype == torch.bfloat16:
        # numpy has no bf16; keep values exact via float32 round-trip
        return t.detach().to(torch.float32).cpu().numpy()
    return t.detach().cpu().numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a model dir (HF layout, handling shard index files) or a single
    .bin/.safetensors file into {key: np.ndarray}."""
    import torch

    if os.path.isdir(path):
        out: Dict[str, np.ndarray] = {}
        st_index = os.path.join(path, "model.safetensors.index.json")
        bin_index = os.path.join(path, "pytorch_model.bin.index.json")
        if os.path.exists(st_index):
            with open(st_index) as f:
                shards = sorted(set(json.load(f)["weight_map"].values()))
            for shard in shards:
                out.update(load_torch_state_dict(os.path.join(path, shard)))
        elif os.path.exists(bin_index):
            with open(bin_index) as f:
                shards = sorted(set(json.load(f)["weight_map"].values()))
            for shard in shards:
                out.update(load_torch_state_dict(os.path.join(path, shard)))
        else:
            for name in ("model.safetensors", "pytorch_model.bin"):
                p = os.path.join(path, name)
                if os.path.exists(p):
                    return load_torch_state_dict(p)
            raise FileNotFoundError(f"no checkpoint found under {path}")
        return out

    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(path)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _to_numpy(v) for k, v in sd.items()}


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str, dtype=None) -> None:
    """Write {key: np.ndarray} as a torch .bin (the reference artifact format,
    deepspeed.py:383). ``dtype``: optional torch dtype (e.g. torch.bfloat16)."""
    import torch

    out = {}
    for k, v in sd.items():
        # copy: jax buffers are read-only and torch wants writable memory
        t = torch.from_numpy(np.array(v, copy=True))
        if dtype is not None:
            t = t.to(dtype)
        out[k] = t
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(out, path)
