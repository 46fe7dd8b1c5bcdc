"""Key-manifest audit tool (tools/check_key_manifest.py): the shipped
fixture manifests for the three published backbones audit CLEAN against the
production io mappings, and perturbations are detected.

Reference behavior covered: strict load_state_dict over the real published
checkpoints (eval/reward_adaptor_loader.py:24-63) — validated here at the
key level since the environment has no egress for the weights themselves."""

import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)

from check_key_manifest import FIXTURES, audit, load_manifest  # noqa: E402

MANIFESTS = os.path.join(TOOLS, "manifests")


@pytest.mark.parametrize("model_type,name", sorted(FIXTURES.items()))
def test_fixture_manifest_clean(model_type, name):
    d = os.path.join(MANIFESTS, name)
    keys = load_manifest(os.path.join(d, "keys.txt"))
    findings = audit(model_type, keys, d, verbose=False)
    assert not any(findings.values()), findings


def test_missing_key_detected():
    d = os.path.join(MANIFESTS, FIXTURES["phi3v"])
    keys = [k for k in load_manifest(os.path.join(d, "keys.txt"))
            if k != "model.layers.7.mlp.down_proj.weight"]
    findings = audit("phi3v", keys, d, verbose=False)
    assert "model.layers.7.mlp.down_proj.weight" in findings["missing_keys"]


def test_stray_key_detected():
    d = os.path.join(MANIFESTS, FIXTURES["qwen"])
    keys = load_manifest(os.path.join(d, "keys.txt"))
    keys.append("model.layers.0.self_attn.rotary.weight")
    findings = audit("qwen", keys, d, verbose=False)
    assert "model.layers.0.self_attn.rotary.weight" in findings["unconsumed_keys"]


def test_index_json_manifest_format(tmp_path):
    import json

    d = os.path.join(MANIFESTS, FIXTURES["llava"])
    keys = load_manifest(os.path.join(d, "keys.txt"))
    idx = tmp_path / "model.safetensors.index.json"
    idx.write_text(json.dumps(
        {"weight_map": {k: "model-00001.safetensors" for k in keys}}
    ))
    assert load_manifest(str(idx)) == sorted(keys)
