"""Train entry point — flag-compatible with the reference CLI
(train_llava_reward.py:12-227), TPU-native underneath:

  python train_llava_reward.py --pretrain <hf_dir> --dataset <json> \
      --is_general_preference --value_head_dim 2 --add_cross_attention \
      --lora_rank 128 --lora_alpha 256 --bf16 --gradient_checkpointing ...

Orchestration (reference train(): strategy -> model -> tokenizer ->
optimizer -> data -> scheduler -> trainer.fit):
  mesh init -> load/convert backbone -> processor -> optax tx ->
  blended datasets -> prefetch loader -> RewardTrainer.fit.
"""

from __future__ import annotations

import os

import numpy as np


def train(args):
    import jax
    import jax.numpy as jnp

    from llava_reward_tpu.core.args import build_train_parser
    from llava_reward_tpu.core.config import RewardConfig
    from llava_reward_tpu.core.logging import init_logger
    from llava_reward_tpu.core.registry import get_family
    from llava_reward_tpu.data.datasets import blending_datasets, is_pairwise
    from llava_reward_tpu.data.loader import PrefetchLoader
    from llava_reward_tpu.data.sampler import GroupSampler
    from llava_reward_tpu.io.torch_io import load_torch_state_dict
    from llava_reward_tpu.lora.lora import init_lora, init_vision_lora
    from llava_reward_tpu.parallel.sharding import (
        create_mesh,
        global_batch_from_local,
        shard_params,
    )
    from llava_reward_tpu.reward import init_head_params
    from llava_reward_tpu.reward.model import num_layers_of
    from llava_reward_tpu.train.optim import make_optimizer
    from llava_reward_tpu.train.train_step import make_cls_loss_fn, make_pairwise_loss_fn
    from llava_reward_tpu.train.trainer import RewardTrainer

    logger = init_logger(__name__)
    family = get_family(args.model_type)

    # ---- mesh (the ZeRO replacement, SURVEY.md §2c)
    from llava_reward_tpu.core.mesh import (
        mesh_from_args,
        set_active_mesh,
        setup_distributed,
    )

    setup_distributed()
    mesh = mesh_from_args(args)
    set_active_mesh(mesh)  # kernels shard_map over the batch axes
    n_data = mesh.shape["dp"] * mesh.shape["fsdp"]
    logger.info("mesh %s (%d devices)", dict(mesh.shape), len(jax.devices()))

    rcfg = RewardConfig(
        is_general_preference=args.is_general_preference,
        add_cross_attention=args.add_cross_attention,
        value_head_dim=args.value_head_dim,
        general_preference_tau=args.general_preference_tau,
        add_prompt_head=args.add_prompt_head,
        mean_hidden_state=args.mean_hidden_state,
        layer_id=args.layer_id,
    )

    # ---- model
    param_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.pretrain and os.path.isdir(args.pretrain):
        cfg = family.config_from_pretrain(args.pretrain)
        sd = load_torch_state_dict(args.pretrain)
        backbone = family.params_from_sd(sd, cfg, dtype=np.float32)
        backbone = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype=param_dtype), backbone
        )
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            args.pretrain, use_fast=not args.disable_fast_tokenizer,
            trust_remote_code=True, cache_dir=args.cache_dir,
        )
        family.tokenizer_setup(tokenizer)
    else:
        logger.warning("no --pretrain dir; using tiny random config (smoke mode)")
        cfg = family.tiny_config()
        rcfg.layer_id = num_layers_of(cfg)
        backbone = family.init_params(jax.random.PRNGKey(args.seed), cfg, param_dtype)
        dec = family.decoder_cfg(cfg)

        class _Tok:
            eos_token = "</s>"
            pad_token_id = dec.pad_token_id

            def __call__(self, text):
                # zlib.crc32, NOT hash(): str hash is PYTHONHASHSEED-random
                # per process, which would break cross-process data parity
                # (multi-host training tokenizes each host's rows locally)
                import zlib

                ids = []
                for t in text.split():
                    if t in ("<|image_1|>", "<img>", "<image>") and hasattr(
                        dec, "image_token_id"
                    ):
                        ids.append(dec.image_token_id)
                    else:
                        ids.append(zlib.crc32(t.encode()) % 500 + 3)
                return {"input_ids": ids}

            def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
                def flat(c):
                    if isinstance(c, str):
                        return c
                    return " ".join(
                        ("<img>" if p.get("type") == "image" else p.get("text", ""))
                        for p in c
                    )

                return "x" * 58 + " " + " ".join(flat(m["content"]) for m in msgs) + " " + "x" * 22

        tokenizer = _Tok()

    processor = family.make_processor(tokenizer, cfg)
    # lora_rank == 0 means FULL fine-tuning in the reference (consumed by the
    # _ft_phi eval harness); the whole backbone becomes trainable.
    full_finetune = args.lora_rank == 0
    load_in_8bit = getattr(args, "load_in_8bit", False)
    if full_finetune and (args.load_in_4bit or load_in_8bit):
        raise ValueError("--load_in_4bit/--load_in_8bit require LoRA (frozen backbone)")
    if args.load_in_4bit and load_in_8bit:
        raise ValueError("--load_in_4bit and --load_in_8bit are exclusive")
    if args.load_in_4bit or load_in_8bit:
        # QLoRA-style training over a quantized frozen decoder
        # (rw_model_general_preference.py:166-175). --load_in_4bit: the
        # bitsandbytes-NF4 grid by default (--quant_scheme absmax for
        # symmetric int4), dequantized before each bf16 matmul.
        # --load_in_8bit: W8A8 — weights STAY int8 in the matmul (v5e
        # 394 TOPS path, differentiable via utils/quantize custom_vjp),
        # halving frozen-weight HBM vs bf16 AND speeding the train step.
        from llava_reward_tpu.utils.quantize import quantize_stacked_layers

        scheme = "w8a8" if load_in_8bit else getattr(args, "quant_scheme", "nf4")
        dec_key = "decoder" if "decoder" in backbone else "text"
        backbone = dict(backbone)
        backbone[dec_key] = dict(backbone[dec_key])
        backbone[dec_key]["layers"] = quantize_stacked_layers(
            backbone[dec_key]["layers"], bits=4, scheme=scheme
        )
        logger.info("frozen decoder weights quantized (%s)", scheme)
    if full_finetune:
        logger.info("lora_rank=0 -> full fine-tuning (backbone trainable)")
        frozen = {"backbone": {k: backbone[k] for k in ("lm_head",) if k in backbone}}
        train_backbone = {k: v for k, v in backbone.items() if k != "lm_head"}
    else:
        frozen = {"backbone": backbone}
        train_backbone = None
    trainable = {
        "backbone": train_backbone,
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg, dtype=jnp.float32),
        "lora": (
            init_lora(
                jax.random.PRNGKey(2), family.decoder_cfg(cfg),
                args.lora_rank, args.lora_alpha,
                targets=tuple(args.target_modules) if args.target_modules else family.lora_targets,
            )
            if args.lora_rank > 0
            else None
        ),
        "projector": (
            jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), family.get_projector(backbone)
            )
            if args.ft_projector
            else None
        ),
        "vision_lora": (
            init_vision_lora(
                jax.random.PRNGKey(3), cfg.vision, args.lora_rank, args.lora_alpha
            )
            if args.train_vision and args.lora_rank > 0
            and args.model_type in ("phi3v",)
            else None
        ),
    }

    # ---- data
    train_rows, eval_rows = blending_datasets(
        args.dataset, args.dataset_probs, seed=args.seed,
        max_count=args.max_samples, train_split_ratio=args.train_split_ratio,
    )
    pairwise = is_pairwise(train_rows)
    cls_based = args.cls_based or not pairwise
    ds_cls = family.pointwise_dataset if cls_based else family.pairwise_dataset
    train_ds = ds_cls(train_rows, processor, tokenizer, args.image_root)
    eval_ds = ds_cls(eval_rows, processor, tokenizer, args.image_root) if eval_rows else None

    # multi-host (pod) data path: every process loads ITS shard of the rows
    # (GroupSampler over process ranks — the reference's per-rank
    # DistributedSampler, deepspeed.py:150-171) and feeds a LOCAL batch of
    # global_batch/process_count rows; global_batch_from_local stitches the
    # local shards into one globally-sharded array per leaf.
    n_proc = jax.process_count()
    assert n_data % n_proc == 0, (
        f"data-parallel ways ({n_data}) must divide evenly over "
        f"{n_proc} processes"
    )
    local_batch_size = args.micro_train_batch_size * (n_data // n_proc)
    sampler = GroupSampler(
        len(train_ds), num_replicas=n_proc, rank=jax.process_index(),
        shuffle=True, seed=args.seed, group_size=args.group_size,
    )
    pad_id = family.decoder_cfg(cfg).pad_token_id
    train_loader = PrefetchLoader(
        train_ds, sampler, local_batch_size,
        collate_fn=lambda items: train_ds.collate(items, args.seq_len, pad_id),
        num_workers=args.num_workers,
    )
    train_loader.sampler = sampler
    eval_loader = None
    if eval_ds is not None:
        eval_loader = PrefetchLoader(
            eval_ds,
            GroupSampler(
                len(eval_ds), num_replicas=n_proc, rank=jax.process_index(),
                shuffle=False,
            ),
            local_batch_size,
            collate_fn=lambda items: eval_ds.collate(items, args.seq_len, pad_id),
            num_workers=args.num_workers,
            drop_last=False,
        )

    # ---- optimizer / loss
    steps_per_epoch = max(1, len(train_loader))
    total_steps = steps_per_epoch * args.max_epochs // max(1, args.accumulated_gradient)
    tx = make_optimizer(
        args.learning_rate, total_steps,
        weight_decay=args.l2, max_norm=args.max_norm,
        accumulation_steps=args.accumulated_gradient,
    )
    attn_impl = args.attn_impl
    if args.flash_attn and attn_impl == "auto":
        attn_impl = "auto"  # pallas is already the TPU default
    if cls_based:
        loss_fn = make_cls_loss_fn(
            cfg, rcfg, compute_fp32_loss=args.compute_fp32_loss,
            attn_impl=attn_impl, remat=args.gradient_checkpointing,
            projector_path=family.projector_path,
        )
    else:
        loss_fn = make_pairwise_loss_fn(
            cfg, rcfg, compute_fp32_loss=args.compute_fp32_loss,
            attn_impl=attn_impl, remat=args.gradient_checkpointing,
            add_pretrain_loss=args.add_pretrain_loss,
            ptx_loss_coef=args.ptx_loss_coef,
            reward_scaler_beta=args.reward_scaler_beta,
            add_img_eos=args.add_img_eos,
            projector_path=family.projector_path,
        )

    # ---- shard over the mesh
    with mesh:
        frozen = shard_params(frozen, mesh)
        trainable = shard_params(trainable, mesh)

        wandb_logger = None
        if args.use_wandb:
            try:
                import wandb

                wandb.init(
                    entity=args.wandb_org, project=args.wandb_project,
                    group=args.wandb_group, name=args.wandb_run_name,
                    config=vars(args),
                )
                wandb_logger = wandb
            except Exception as e:  # pragma: no cover
                logger.warning("wandb unavailable: %s", e)

        trainer = RewardTrainer(
            cfg=cfg, rcfg=rcfg, frozen=frozen, trainable=trainable, tx=tx,
            loss_fn=loss_fn, train_loader=train_loader, eval_loader=eval_loader,
            cls_based=cls_based, margin_loss=args.margin_loss,
            max_epochs=args.max_epochs, save_path=args.save_path,
            save_steps=args.save_steps, eval_steps=args.eval_steps,
            logging_steps=args.logging_steps, max_ckpt_num=args.max_ckpt_num,
            lora_rank=args.lora_rank, lora_alpha=args.lora_alpha,
            lora_dropout=args.lora_dropout, wandb_logger=wandb_logger,
            mesh=mesh,
            # single-process this degenerates to shard_batch; multi-host it
            # stitches each host's local rows into the global batch
            shard_batch_fn=lambda b: global_batch_from_local(b, mesh),
            save_best_model=bool(args.save_best_model),
            model_type=args.model_type,
            lora_targets=(
                tuple(args.target_modules) if args.target_modules
                else family.lora_targets
            ),
            ckpt_path=args.ckpt_path,
            ckpt_steps=args.ckpt_steps,
        )
        if args.load_checkpoint and os.path.isdir(
            os.path.join(args.ckpt_path, "train_state")
        ):
            trainer.load_train_ckpt(args.ckpt_path)
        trainer.fit()
        trainer.save_train_ckpt(args.ckpt_path)
    return trainer


if __name__ == "__main__":
    from llava_reward_tpu.core.args import build_train_parser

    train(build_train_parser().parse_args())
