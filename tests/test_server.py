"""Reward-scoring HTTP server over a tiny random model."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from llava_reward_tpu.core.config import RewardConfig, phi3v_tiny_config
    from llava_reward_tpu.evalx.adaptor import RewardAdaptor
    from llava_reward_tpu.evalx.server import RewardService, make_handler
    from llava_reward_tpu.models import phi3v
    from llava_reward_tpu.preprocess.phi3v_processor import Phi3VProcessor
    from llava_reward_tpu.reward import init_head_params

    cfg = phi3v_tiny_config(num_crops=4)
    rcfg = RewardConfig(is_general_preference=True, value_head_dim=2)
    rcfg.layer_id = cfg.decoder.num_layers
    params = {
        "backbone": phi3v.init_params(jax.random.PRNGKey(0), cfg),
        "head": init_head_params(jax.random.PRNGKey(1), cfg, rcfg),
    }
    adaptor = RewardAdaptor(cfg=cfg, rcfg=rcfg, params=params, model_type="phi3v")

    class Tok:
        eos_token = "</s>"

        def __call__(self, text):
            return {"input_ids": [hash(t) % 400 + 2 for t in text.split()]}

        def apply_chat_template(self, msgs, tokenize=False, add_generation_prompt=True):
            return "".join(m["content"] for m in msgs) + " " + "x" * 22

    tok = Tok()
    proc = Phi3VProcessor(tok, num_crops=4)
    service = RewardService(adaptor, tok, proc, seq_len=900, max_batch=2)
    # override score fn to the xla impl for CPU tests
    service._score = adaptor.make_score_fn(attn_impl="xla", training=False)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"]


def test_score_pair(server_url, tmp_path, rng):
    from PIL import Image

    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    Image.fromarray((rng.random((80, 100, 3)) * 255).astype(np.uint8)).save(p1)
    Image.fromarray((rng.random((90, 90, 3)) * 255).astype(np.uint8)).save(p2)
    out = _post(
        server_url + "/score_pair",
        {"prompt": "a nice landscape", "chosen": p1, "rejected": p2},
    )
    assert 0.0 <= out["prob"] <= 1.0
    assert len(out["chosen_reward"]) == 2


def test_score_base64(server_url, rng):
    import base64
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
        buf, format="PNG"
    )
    b64 = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    out = _post(server_url + "/score", {"caption": "tiny image", "images": [b64]})
    assert len(out["rewards"]) == 1


def test_batcher_coalesces_concurrent_requests():
    """Concurrent score() calls within the window share ONE device call
    (the round-1 server serialised whole requests behind the lock)."""
    import threading
    import time

    import numpy as np

    from llava_reward_tpu.evalx.server import RewardService

    svc = RewardService.__new__(RewardService)
    svc.max_batch = 8
    svc.batch_window_ms = 60.0
    calls = []

    def fake_score_samples(samples):
        calls.append(len(samples))
        time.sleep(0.02)
        return np.arange(len(samples), dtype=np.float32)[:, None]

    svc._score_samples = fake_score_samples
    svc._template = lambda c: c
    svc.processor = lambda text, imgs: ("sample", text)
    svc._start_batcher()

    import llava_reward_tpu.evalx.server as srv_mod
    orig = srv_mod._load_image
    srv_mod._load_image = lambda s: s
    try:
        results = {}

        def req(name):
            results[name] = svc.score(name, ["img"])

        threads = [threading.Thread(target=req, args=(f"r{i}",)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
    finally:
        srv_mod._load_image = orig

    assert len(results) == 4
    for v in results.values():
        assert v.shape == (1, 1)
    # 4 one-sample requests -> strictly fewer device calls than requests
    assert sum(calls) == 4 and len(calls) < 4, calls
