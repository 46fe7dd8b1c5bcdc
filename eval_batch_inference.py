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
    p.add_argument("--pretrain", default=None,
                   help="base checkpoint dir; defaults to --pm_path (full-FT mode)")
    p.add_argument("--pm_path", required=True)
    p.add_argument("--model_type", default="phi3v", choices=["phi3v", "qwen", "llava"])
    p.add_argument("--dataset", required=True)
    p.add_argument("--dataset_probs", default=None)
    p.add_argument("--image_root", default=None)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--micro_batch_size", type=int, default=8)
    p.add_argument("--seq_len", "--max_len", type=int, default=2944)
    p.add_argument("--num_workers", type=int, default=8)
    # the reference loads the projector conditionally
    # (reward_adaptor_loader.py:98-104): --no-ft_projector skips it
    p.add_argument("--ft_projector", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--attn_impl", default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument("--load_in_8bit", action="store_true", default=False,
                   help="int8 inference mode: frozen-backbone matmuls run "
                   "W8A8 on the MXU's double-rate int8 path (2x bf16 peak); "
                   "LoRA is merged before quantization")
    p.add_argument("--load_in_4bit", action="store_true", default=False,
                   help="weight-only nf4 backbone (the reference's "
                   "--load_in_4bit; HBM capacity, not speed)")
    # reference ft-phi harness parity (batch_inference_rm_ft_phi.py:28-55):
    # full-FT checkpoints are loaded straight from pm_path and the reward
    # config may be given on the CLI instead of reward_config.yaml
    p.add_argument("--full_ft", action="store_true",
                   help="load a full-finetune checkpoint from pm_path (no lora/)")
    p.add_argument("--cls_based", action="store_true",
                   help="force the pointwise classification path")
    p.add_argument("--is_general_preference", action="store_true", default=None)
    p.add_argument("--add_cross_attention", action="store_true", default=None)
    p.add_argument("--value_head_dim", type=int, default=None)
    p.add_argument("--general_preference_tau", type=float, default=None)
    p.add_argument("--is_custom_dataset", action="store_true",
                   help="accepted for reference CLI parity (format is sniffed)")
    args = p.parse_args()
    if args.pretrain is None:
        args.pretrain = args.pm_path  # full-FT layout: base + head in one dir

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from llava_reward_tpu.core.registry import get_family
    from llava_reward_tpu.data.datasets import blending_datasets
    from llava_reward_tpu.evalx.adaptor import load_reward_adaptor
    from llava_reward_tpu.evalx.batch_inference import batch_rm_inference

    family = get_family(args.model_type)
    quant = "w8a8" if args.load_in_8bit else ("nf4" if args.load_in_4bit else None)
    adaptor = load_reward_adaptor(
        args.pretrain, args.pm_path, model_type=args.model_type,
        ft_projector=args.ft_projector and not args.full_ft,
        compute_dtype=jnp.bfloat16, quantize=quant,
    )
    # CLI reward-config overrides (reference passes these for ft checkpoints)
    if args.is_general_preference is not None:
        adaptor.rcfg.is_general_preference = args.is_general_preference
    if args.add_cross_attention is not None:
        adaptor.rcfg.add_cross_attention = args.add_cross_attention
    if args.value_head_dim is not None:
        adaptor.rcfg.value_head_dim = args.value_head_dim
    if args.general_preference_tau is not None:
        adaptor.rcfg.general_preference_tau = args.general_preference_tau
    try:
        tokenizer = AutoTokenizer.from_pretrained(args.pretrain, trust_remote_code=True)
        family.tokenizer_setup(tokenizer)
    except (OSError, ValueError):
        # checkpoint dir without tokenizer files (e.g. a bare full-FT save):
        # deterministic hash tokenizer — same smoke fallback as the train CLI
        print(f"no tokenizer files in {args.pretrain}; using hash tokenizer (smoke)")
        dec = family.decoder_cfg(adaptor.cfg)

        class _Tok:
            eos_token = "</s>"
            pad_token_id = dec.pad_token_id

            def __call__(self, text):
                return {"input_ids": [hash(t) % 500 + 3 for t in text.split()]}

            def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
                def flat(c):
                    if isinstance(c, str):
                        return c
                    return " ".join(
                        ("<img>" if p.get("type") == "image" else p.get("text", ""))
                        for p in c
                    )

                return ("x" * 58 + " "
                        + " ".join(flat(m["content"]) for m in msgs) + " " + "x" * 22)

        tokenizer = _Tok()
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
        profile_dir=args.profile_dir, cls_based=args.cls_based,
    )
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
