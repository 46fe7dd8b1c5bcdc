"""Two-process jax.distributed worker: tiny FSDP train step on a GLOBAL
8-device CPU mesh (4 local devices x 2 processes), data sharded per host
with GroupSampler. Launched by test_multiprocess.py; prints one JSON line.

This is the missing multi-proc coverage of the reference's deepspeed launch
(llava_reward/utils/deepspeed.py:97-111): every process runs this script,
setup_distributed wires the global runtime, and the loss must equal the
single-process 8-virtual-device run bit-for-bit.
"""

import json
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from llava_reward_tpu.core.mesh import setup_distributed

    setup_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import numpy as np

    from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
    from llava_reward_tpu.data.sampler import GroupSampler
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.parallel.sharding import (
        create_mesh,
        global_batch_from_local,
        shard_params,
    )
    from llava_reward_tpu.reward import RewardBatch, init_head_params
    from llava_reward_tpu.train.optim import make_optimizer
    from llava_reward_tpu.train.train_step import (
        init_train_state,
        make_pairwise_loss_fn,
        make_train_step,
    )
    from llava_reward_tpu.lora.lora import init_lora

    cfg = phi3v_tiny_config(num_crops=4, num_layers=2, vision_layers=1)
    rcfg = RewardConfig()
    rcfg.layer_id = cfg.decoder.num_layers
    frozen = {"backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg)}
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": init_lora(jax.random.PRNGKey(2), cfg.decoder, 4, 8),
        "projector": None,
    }

    # deterministic 8-row dataset; every process builds the same table, then
    # takes ITS rows via the group sampler (per-host data loading)
    B, S = 8, 16
    rng = np.random.default_rng(7)
    ids_c = rng.integers(2, cfg.decoder.vocab_size - 2, (B, S)).astype(np.int32)
    ids_r = rng.integers(2, cfg.decoder.vocab_size - 2, (B, S)).astype(np.int32)

    sampler = GroupSampler(
        B, num_replicas=nproc, rank=pid, shuffle=True, group_size=2, seed=3
    )
    local_idx = np.asarray(list(iter(sampler)))

    def batch(ids):
        return RewardBatch(
            input_ids=ids[local_idx],
            attention_mask=np.ones((len(local_idx), S), np.int32),
            pixel_values=None, img_gather_idx=None, splice_idx=None,
            num_img_tokens=None,
        )

    mesh = create_mesh(dp=nproc, fsdp=4, tp=1)
    tx = make_optimizer(1e-3, 10, warmup_ratio=0.0)
    loss_fn = make_pairwise_loss_fn(cfg, rcfg, attn_impl="xla", remat=False)
    step = jax.jit(make_train_step(loss_fn, tx))
    with mesh:
        frozen_s = shard_params(frozen, mesh)
        st = init_train_state(shard_params(trainable, mesh), tx)
        chosen = global_batch_from_local(batch(ids_c), mesh)
        rejected = global_batch_from_local(batch(ids_r), mesh)
        st, metrics = step(st, frozen_s, chosen, rejected)
        loss = float(jax.device_get(metrics["preference_loss"]))
        gnorm = float(jax.device_get(metrics["grad_norm"]))

    print(json.dumps({
        "pid": pid,
        "loss": loss,
        "grad_norm": gnorm,
        "local_rows": sorted(int(i) for i in local_idx),
    }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
