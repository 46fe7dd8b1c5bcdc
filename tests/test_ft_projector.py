"""--ft_projector correctness across families (ADVICE r1, high/medium):

1. the trainable projector must receive NONZERO gradients (the forward must
   read the trainable copy, not the frozen one) for qwen and llava, whose
   projector slots differ from phi3v's hardcoded path;
2. qwen/llava projector artifacts must round-trip through the reference
   loader's re-keying (reward_adaptor_loader.py:98-110, :143-148).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_reward_tpu.core.config import (
    RewardConfig,
    llava_tiny_config,
    qwen_tiny_config,
)
from llava_reward_tpu.core.registry import get_family
from llava_reward_tpu.models import llava_next, qwen25_vl
from llava_reward_tpu.preprocess.collate import (
    collate_qwen_samples,
    collate_samples,
    to_reward_batch,
)
from llava_reward_tpu.reward import init_head_params
from llava_reward_tpu.train.train_step import make_pairwise_loss_fn


def _img(seed, h=90, w=120):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))


def _grad_norms(tree):
    return {
        "/".join(str(p) for p in path): float(jnp.linalg.norm(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _qwen_setup():
    from llava_reward_tpu.preprocess.qwen_vision import Qwen25VLProcessor

    cfg = qwen_tiny_config(num_layers=2, vision_depth=2)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.text.num_layers
    backbone = qwen25_vl.init_params(jax.random.PRNGKey(0), cfg)

    class Tok:
        def __call__(self, text):
            return {
                "input_ids": [
                    cfg.text.image_token_id if t == "<img>" else hash(t) % 400 + 2
                    for t in text.split()
                ]
            }

    proc = Qwen25VLProcessor(
        Tok(), min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels,
        image_token_id=cfg.text.image_token_id,
    )

    def batch(texts_imgs):
        samples = [proc(t, [i]) for t, i in texts_imgs]
        return to_reward_batch(
            collate_qwen_samples(
                samples, 80, cfg.text.pad_token_id,
                patch_budget=512, unit_budget=128,
            )
        )

    return cfg, rcfg, backbone, batch


def _llava_setup():
    from llava_reward_tpu.preprocess.llava_processor import LlavaNextProcessor

    cfg = llava_tiny_config(num_layers=2, vision_layers=2)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.text.num_layers
    backbone = llava_next.init_params(jax.random.PRNGKey(0), cfg)

    class Tok:
        def __call__(self, text):
            return {
                "input_ids": [
                    cfg.text.image_token_id if t == "<image>" else hash(t) % 300 + 3
                    for t in text.split()
                ]
            }

    proc = LlavaNextProcessor(
        Tok(), image_token_id=cfg.text.image_token_id,
        grid_pinpoints=cfg.grid_pinpoints,
    )

    def batch(texts_imgs):
        samples = [proc(t, [i]) for t, i in texts_imgs]
        seq = max(len(s.input_ids) for s in samples) + 4
        return to_reward_batch(collate_samples(samples, seq, 0))

    return cfg, rcfg, backbone, batch


@pytest.mark.parametrize("family_name", ["qwen", "llava"])
def test_ft_projector_gets_gradients(family_name):
    family = get_family(family_name)
    if family_name == "qwen":
        cfg, rcfg, backbone, batch = _qwen_setup()
        tag = "<img>"
    else:
        cfg, rcfg, backbone, batch = _llava_setup()
        tag = "<image>"

    projector = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), family.get_projector(backbone)
    )
    trainable = {
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
        "lora": None,
        "projector": projector,
        "vision_lora": None,
    }
    frozen = {"backbone": backbone}
    loss_fn = make_pairwise_loss_fn(
        cfg, rcfg, attn_impl="xla", remat=False,
        projector_path=family.projector_path,
    )
    cb = batch([(f"{tag} crisp photo", _img(10))])
    rb = batch([(f"{tag} noisy photo", _img(11))])
    grads, _ = jax.grad(loss_fn, has_aux=True)(trainable, frozen, cb, rb)
    norms = _grad_norms(grads["projector"])
    assert norms, "projector grads missing"
    for name, n in norms.items():
        assert n > 0, f"projector grad {name} is zero — trainable copy unused"

    # and the forward actually reads the trainable projector: perturbing it
    # must change the loss
    loss0, _ = loss_fn(trainable, frozen, cb, rb)
    bumped = dict(trainable)
    bumped["projector"] = jax.tree_util.tree_map(
        lambda x: x + 0.05, trainable["projector"]
    )
    loss1, _ = loss_fn(bumped, frozen, cb, rb)
    assert float(loss0) != float(loss1)


@pytest.mark.parametrize("family_name", ["qwen", "llava"])
def test_projector_artifact_roundtrip(family_name, tmp_path):
    import torch

    from llava_reward_tpu.io.artifact import (
        load_llava_projector_params,
        load_qwen_merger_params,
        save_reward_artifact,
    )

    family = get_family(family_name)
    if family_name == "qwen":
        cfg, rcfg, backbone, _ = _qwen_setup()
        loader = load_qwen_merger_params
    else:
        cfg, rcfg, backbone, _ = _llava_setup()
        loader = load_llava_projector_params

    projector = jax.device_get(family.get_projector(backbone))
    head = jax.device_get(init_head_params(jax.random.PRNGKey(1), cfg, rcfg))
    save_reward_artifact(
        str(tmp_path), rcfg, head, projector_params=projector,
        torch_dtype=torch.float32, model_type=family_name,
    )
    loaded = loader(str(tmp_path))
    assert loaded is not None
    flat_a = jax.tree_util.tree_leaves_with_path(projector)
    flat_b = {tuple(str(p) for p in path): leaf
              for path, leaf in jax.tree_util.tree_leaves_with_path(loaded)}
    for path, leaf in flat_a:
        key = tuple(str(p) for p in path)
        assert key in flat_b, f"missing {key} after roundtrip"
        np.testing.assert_allclose(np.asarray(leaf), flat_b[key], rtol=1e-6)
