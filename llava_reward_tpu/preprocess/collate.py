"""Collation of ProcessedSamples into static-shape device batches.

The reference left-pads ids/masks to the batch max (zero_pad_sequences,
datasets/utils.py:5-13) and stacks pixel tensors (reward_dataset.py:137-202).
On TPU we pad to a FIXED ``seq_len`` so every step hits the same compiled
program; left padding preserves the training-mode ``values[:, -1]`` readout
and the eval-mode EOS gather.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .phi3v_processor import ProcessedSample


class Batch(dict):
    """Numpy batch with attribute access; converted to RewardBatch on device."""

    __getattr__ = dict.__getitem__


def collate_samples(
    samples: Sequence[ProcessedSample],
    seq_len: int,
    pad_token_id: int,
    img_token_budget: Optional[int] = None,
) -> Batch:
    """Left-pad to ``seq_len`` (truncating from the right if too long, the
    reference's truncation_side='right') and stack."""
    B = len(samples)
    input_ids = np.full((B, seq_len), pad_token_id, dtype=np.int32)
    attention_mask = np.zeros((B, seq_len), dtype=np.int32)
    splice_idx = np.full((B, seq_len), -1, dtype=np.int32)

    has_image = any(s.pixel_values is not None for s in samples)
    pixel_values = None
    img_gather_idx = None
    num_img_tokens = None
    if has_image:
        ref = next(s for s in samples if s.pixel_values is not None)
        budget = (
            img_token_budget
            if img_token_budget is not None
            else ref.img_gather_idx.shape[0]
        )
        pixel_values = np.zeros((B,) + ref.pixel_values.shape, dtype=np.float32)
        img_gather_idx = np.zeros((B, budget), dtype=np.int32)
        num_img_tokens = np.zeros((B,), dtype=np.int32)

    for b, s in enumerate(samples):
        ids = s.input_ids[:seq_len]
        n = ids.shape[0]
        input_ids[b, seq_len - n :] = ids
        attention_mask[b, seq_len - n :] = s.attention_mask[:seq_len]
        splice_idx[b, seq_len - n :] = s.splice_idx[:seq_len]
        if has_image and s.pixel_values is not None:
            pixel_values[b] = s.pixel_values
            img_gather_idx[b] = s.img_gather_idx
            num_img_tokens[b] = s.num_img_tokens

    return Batch(
        input_ids=input_ids,
        attention_mask=attention_mask,
        splice_idx=splice_idx,
        pixel_values=pixel_values,
        img_gather_idx=img_gather_idx,
        num_img_tokens=num_img_tokens,
    )


def to_reward_batch(batch: Batch):
    """Numpy Batch -> reward.model.RewardBatch (device put happens at jit)."""
    from ..reward.model import RewardBatch

    return RewardBatch(
        input_ids=batch["input_ids"],
        attention_mask=batch["attention_mask"],
        pixel_values=batch["pixel_values"],
        img_gather_idx=batch["img_gather_idx"],
        splice_idx=batch["splice_idx"],
        num_img_tokens=batch["num_img_tokens"],
    )
