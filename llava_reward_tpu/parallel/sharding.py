"""Mesh + sharding rules: the TPU-native replacement for DeepSpeed ZeRO.

Reference runtime (llava_reward/utils/deepspeed.py): NCCL process groups +
ZeRO-1/2/3 partitioning + ZeRO++ hpZ. TPU-native equivalent (SURVEY.md §2c):
one ``jax.sharding.Mesh`` with axes

  dp    pure data parallelism (params replicated)       — ZeRO-0
  fsdp  params/optimizer state sharded over this axis    — ZeRO-3
  tp    tensor parallelism over heads / mlp hidden       — (beyond reference)

Batches shard over (dp, fsdp); XLA inserts the all-gathers/reduce-scatters
that DeepSpeed does by hand, and lays them on ICI. ZeRO++ hpZ ≈ putting fsdp
on the ICI-local mesh dims and dp across DCN — with ``create_hybrid_mesh``.

Sharding is expressed as path-based rules over the param pytree, so model
code stays annotation-free.
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    dp: int = 1, fsdp: int = -1, tp: int = 1, devices=None
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh. fsdp=-1 absorbs the remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if fsdp == -1:
        assert n % (dp * tp) == 0, (n, dp, tp)
        fsdp = n // (dp * tp)
    assert dp * fsdp * tp == n, f"mesh {dp}x{fsdp}x{tp} != {n} devices"
    return Mesh(devices.reshape(dp, fsdp, tp), ("dp", "fsdp", "tp"))


def create_hybrid_mesh(dp_dcn: int, fsdp_ici: int, tp: int = 1) -> Mesh:
    """Multi-slice layout: fsdp inside a slice (ICI), dp across slices (DCN)
    — the ZeRO++ hpZ analogue (deepspeed_utils.py:39, zero_hpz_partition_size).

    On real multi-slice TPU topologies the devices are grouped by their
    ``slice_index`` so the fsdp all-gathers ride ICI and only the dp
    gradient reduction crosses DCN. Single-slice (or CPU-virtual) device
    sets have no slice boundaries — the layout degenerates to contiguous
    fsdp groups, which preserves the (dp, fsdp, tp) semantics and lets the
    zpg path be validated anywhere."""
    from jax.experimental import mesh_utils

    devices = jax.devices()
    if getattr(devices[0], "slice_index", None) is not None:
        dev_mesh = mesh_utils.create_hybrid_device_mesh(
            (1, fsdp_ici, tp), (dp_dcn, 1, 1)
        )
    else:
        n = dp_dcn * fsdp_ici * tp
        assert len(devices) >= n, (len(devices), n)
        dev_mesh = np.asarray(devices[:n]).reshape(dp_dcn, fsdp_ici, tp)
    return Mesh(dev_mesh, ("dp", "fsdp", "tp"))


# (regex over 'a/b/c' joined tree path) -> PartitionSpec
# Stacked decoder/vision layers have a leading L axis (never sharded: scan).
_PARAM_RULES: Sequence[Tuple[str, P]] = (
    # decoder
    (r".*embed_tokens$", P("fsdp", "tp")),
    (r".*layers/qkv_proj$", P(None, "fsdp", "tp")),
    (r".*layers/o_proj$", P(None, "tp", "fsdp")),
    (r".*layers/gate_up_proj$", P(None, "fsdp", "tp")),
    (r".*layers/down_proj$", P(None, "tp", "fsdp")),
    (r".*layers/(input|post_attention)_layernorm$", P()),
    (r".*final_layernorm$", P()),
    (r".*lm_head$", P("fsdp", "tp")),
    # qwen / llava decoders (unfused per-projection layout, {kernel, bias})
    (r".*layers/(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel$",
     P(None, "fsdp", "tp")),
    (r".*layers/(o_proj|down_proj)/kernel$", P(None, "tp", "fsdp")),
    # qwen window-attention vision tower
    (r".*visual/patch_embed$", P("fsdp", None)),
    (r".*blocks/qkv/kernel$", P(None, "fsdp", "tp")),
    (r".*blocks/proj/kernel$", P(None, "tp", "fsdp")),
    (r".*blocks/mlp/(gate|up)/kernel$", P(None, "fsdp", "tp")),
    (r".*blocks/mlp/down/kernel$", P(None, "tp", "fsdp")),
    (r".*merger/fc[12]/kernel$", P("fsdp", "tp")),
    # llava projector
    (r".*vision/projector/fc[12]/kernel$", P("fsdp", "tp")),
    # clip tower
    (r".*clip/patch_proj$", P("fsdp", None)),
    (r".*clip/position_embedding$", P()),
    (r".*clip/class_embedding$", P()),
    (r".*clip/layers/attn/(q|k|v)/kernel$", P(None, "fsdp", "tp")),
    (r".*clip/layers/attn/out/kernel$", P(None, "tp", "fsdp")),
    (r".*clip/layers/mlp/fc1/kernel$", P(None, "fsdp", "tp")),
    (r".*clip/layers/mlp/fc2/kernel$", P(None, "tp", "fsdp")),
    # projector
    (r".*img_projection/fc1/kernel$", P("fsdp", "tp")),
    (r".*img_projection/fc2/kernel$", P("fsdp", "tp")),
    # lora (tiny: shard the big input dim of A over fsdp, replicate B)
    (r".*lora.*/a$", P(None, "fsdp", None)),
    (r".*lora.*/b$", P()),
    # reward heads / skipca (tiny, replicated)
    (r".*(value_head|prompt_head)/kernel$", P()),
    (r".*W_[qkv]/kernel$", P("fsdp", "tp")),
)


def spec_for_path(path: str, leaf=None) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.match(pattern, path):
            if leaf is not None and len(spec) > getattr(leaf, "ndim", 99):
                return P()
            return spec
    return P()  # default: replicate (norms, biases, scales)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_specs(params) -> dict:
    """Pytree of PartitionSpecs matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), leaf), params
    )


def _divisible_spec(spec: P, leaf, mesh: Mesh) -> P:
    """Drop sharding on dims the mesh doesn't divide (e.g. the 588-row CLIP
    patch_proj under fsdp=8): replicate that dim instead of erroring."""
    if leaf is None or not hasattr(leaf, "shape"):
        return spec
    fixed = []
    for d, names in enumerate(spec):
        if names is None:
            fixed.append(None)
            continue
        group = names if isinstance(names, tuple) else (names,)
        size = int(np.prod([mesh.shape[n] for n in group]))
        fixed.append(names if leaf.shape[d] % size == 0 else None)
    return P(*fixed)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda spec, leaf: NamedSharding(mesh, _divisible_spec(spec, leaf, mesh)),
        param_specs(params),
        params,
    )


def shard_params(params, mesh: Mesh):
    """Device-put the tree with its rule-derived shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(params, mesh)
    )


def batch_spec() -> P:
    """Batches shard over the combined data axes."""
    return P(("dp", "fsdp"))


def batch_sharding(mesh: Mesh, leaf) -> NamedSharding:
    if getattr(leaf, "ndim", 0) == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (leaf.ndim - 1))))


def _field_batch_sharding(mesh: Mesh, name: str, leaf) -> NamedSharding:
    if getattr(leaf, "ndim", 0) == 0:
        return NamedSharding(mesh, P())
    # M-RoPE position ids are (3, B, S): the batch axis is axis 1
    axis = 1 if name == "position_ids" and leaf.ndim >= 2 else 0
    spec = [None] * leaf.ndim
    spec[axis] = ("dp", "fsdp")
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh: Mesh):
    from ..reward.model import RewardBatch

    if isinstance(batch, RewardBatch):
        fields = {}
        for name, value in zip(batch._fields, batch):
            fields[name] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, _field_batch_sharding(mesh, name, x)),
                value,
            )
        return RewardBatch(**fields)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x)), batch
    )


def global_batch_from_local(local_batch, mesh: Mesh):
    """Multi-host data path: each process loads its OWN rows (GroupSampler
    with num_replicas == jax.process_count()), then the local shards are
    stitched into one global batch-sharded array per leaf. Replaces the
    per-rank DistributedSampler + NCCL-implicit global batch of the
    reference (deepspeed.py:150-171). Single-process: plain shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh)
    from jax.experimental import multihost_utils

    def to_global(x, batch_axis=0):
        x = np.asarray(x)
        if x.ndim == 0:
            spec = P()
        else:
            dims = [None] * x.ndim
            dims[batch_axis] = ("dp", "fsdp")
            spec = P(*dims)
        return multihost_utils.host_local_array_to_global_array(x, mesh, spec)

    from ..reward.model import RewardBatch

    if isinstance(local_batch, RewardBatch):
        fields = {}
        for name, value in zip(local_batch._fields, local_batch):
            # M-RoPE position ids are (3, B, S): batch axis 1 (shard_batch)
            axis = 1 if name == "position_ids" else 0
            fields[name] = jax.tree_util.tree_map(
                lambda x, a=axis: to_global(x, a), value
            )
        return RewardBatch(**fields)
    return jax.tree_util.tree_map(to_global, local_batch)
