"""Batch eval CLI — the TPU equivalent of eval/batch_inference_rm_*.py:

    python eval_batch_inference.py --pretrain <hf_dir> --pm_path <artifact> \
        --dataset data/pairwise.json [--image_root DIR] [--max_samples N]

Pairwise/pointwise format is sniffed from the rows; prints the reference's
metrics (accuracy / tie-excluded accuracy / mean prob, or acc/F1/recall)
plus mean forward latency.
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain", required=True)
    p.add_argument("--pm_path", required=True)
    p.add_argument("--model_type", default="phi3v", choices=["phi3v", "qwen", "llava"])
    p.add_argument("--dataset", required=True)
    p.add_argument("--dataset_probs", default=None)
    p.add_argument("--image_root", default=None)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--micro_batch_size", type=int, default=8)
    p.add_argument("--seq_len", type=int, default=2944)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--ft_projector", action="store_true", default=True)
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--attn_impl", default="auto", choices=["auto", "pallas", "xla"])
    args = p.parse_args()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from llava_reward_tpu.core.registry import get_family
    from llava_reward_tpu.data.datasets import blending_datasets
    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor
    from llava_reward_tpu.evalx.batch_inference import batch_rm_inference

    family = get_family(args.model_type)
    adaptor = load_reward_adaptor(
        args.pretrain, args.pm_path, model_type=args.model_type,
        ft_projector=args.ft_projector, compute_dtype=jnp.bfloat16,
    )
    tokenizer = AutoTokenizer.from_pretrained(args.pretrain, trust_remote_code=True)
    family.tokenizer_setup(tokenizer)
    processor = family.make_processor(tokenizer, adaptor.cfg)

    rows, _ = blending_datasets(
        args.dataset, args.dataset_probs, return_eval=False,
        max_count=args.max_samples or 2_000_000,
    )
    metrics = batch_rm_inference(
        adaptor, rows, tokenizer, processor,
        batch_size=args.micro_batch_size, seq_len=args.seq_len,
        max_samples=args.max_samples, num_workers=args.num_workers,
        image_root=args.image_root, attn_impl=args.attn_impl,
        profile_dir=args.profile_dir,
    )
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
