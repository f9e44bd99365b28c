"""`lvr serve` tests: the OpenAI-compatible server fronting (a) a canned
LMM and (b) the real tiny-JAX LlavaLMM, driven by our own `openai-api`
client — the two speak the same dialect by construction."""

import json
import urllib.request

import numpy as np
import jax

from law_of_vision_representation_in_mllms_tpu.eval.api import Instance, LMM
from law_of_vision_representation_in_mllms_tpu.serve import (
    LMMServer, _parse_messages)


class CannedLMM(LMM):
    def __init__(self):
        self.seen = []

    def generate_until(self, requests):
        self.seen.extend(requests)
        return [f"ok:{len(r.visual or [])}img:{r.args[0][:20]}"
                for r in requests]

    def loglikelihood(self, requests):
        return [(0.0, True)] * len(requests)


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_server_chat_completions_and_introspection():
    lmm = CannedLMM()
    srv = LMMServer(lmm, model_name="tiny", port=0)
    srv.start_background()
    try:
        # health + models
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/v1/models") as r:
            assert json.loads(r.read())["data"][0]["id"] == "tiny"

        # text-only chat
        out = _post(srv.port, {"model": "tiny", "max_tokens": 8,
                               "messages": [{"role": "user",
                                             "content": "hello there"}]})
        msg = out["choices"][0]["message"]
        assert msg["role"] == "assistant"
        assert msg["content"].startswith("ok:0img:hello there")
        assert lmm.seen[-1].args[1]["max_new_tokens"] == 8

        # data-URL image part -> PIL image + '<image>' marker
        import base64
        from io import BytesIO
        from PIL import Image
        buf = BytesIO()
        Image.new("RGB", (8, 8), (1, 2, 3)).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        out = _post(srv.port, {"messages": [{"role": "user", "content": [
            {"type": "text", "text": "What?"},
            {"type": "image_url", "image_url": {
                "url": f"data:image/png;base64,{b64}"}}]}]})
        assert out["choices"][0]["message"]["content"].startswith("ok:1img")
        assert "<image>" in lmm.seen[-1].args[0]

        # malformed request -> structured 400, server stays alive
        try:
            _post(srv.port, {"messages": [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": "https://x/y.png"}}]}]})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "data:image" in json.loads(e.read())["error"]["message"]
        out = _post(srv.port, {"messages": [
            {"role": "user", "content": "still alive?"}]})
        assert out["choices"][0]["message"]["content"].startswith("ok:0img")

        # OpenAI `stop` maps to gen_kwargs `until` (string or list), and
        # list-valued kwargs survive the wave worker's grouping key
        out = _post(srv.port, {"messages": [
            {"role": "user", "content": "with stop"}], "stop": "END"})
        assert out["choices"][0]["message"]["content"].startswith("ok:")
        assert lmm.seen[-1].args[1]["until"] == ["END"]
        out = _post(srv.port, {"messages": [
            {"role": "user", "content": "stops"}], "stop": ["a", "b"]})
        assert out["choices"][0]["message"]["content"].startswith("ok:")
        assert lmm.seen[-1].args[1]["until"] == ["a", "b"]
    finally:
        srv.shutdown()


def test_server_roundtrip_with_openai_adapter_and_tiny_llava():
    """Our openai-api client talking to our server running the real tiny
    JAX LlavaLMM end-to-end (tower -> splice -> decode)."""
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.eval.models_registry \
        import build_lmm_by_name
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig)
    from PIL import Image

    vit_cfg = ViTConfig(image_size=224, patch_size=32, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    entry = TowerEntry(name="openai/clip-vit-large-patch14", kind="vit",
                       vit_config=vit_cfg, vit_family="clip",
                       hidden_size=16, num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=1000, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=FP32_PRECISION, batch_size=1)

    srv = LMMServer(lmm, model_name="tiny-llava", port=0)
    srv.start_background()
    try:
        client = build_lmm_by_name(
            "openai-api", model_version="tiny-llava",
            api_url=f"http://127.0.0.1:{srv.port}/v1/chat/completions",
            api_key="k", retries=1)
        img = Image.new("RGB", (32, 32), (90, 30, 200))
        reqs = [Instance("generate_until", {}, 0, "t",
                         ("describe<image>", {"max_new_tokens": 4}),
                         visual=[img])]
        out = client.generate_until(reqs)
        assert len(out) == 1 and isinstance(out[0], str)
    finally:
        srv.shutdown()


def test_dynamic_batching_coalesces_concurrent_requests():
    import threading
    import time as _time

    class SlowLMM(LMM):
        def __init__(self):
            self.batches = []

        def generate_until(self, requests):
            self.batches.append(len(requests))
            _time.sleep(0.05)
            return [f"r{i}" for i in range(len(requests))]

        def loglikelihood(self, requests):
            return [(0.0, True)] * len(requests)

    lmm = SlowLMM()
    srv = LMMServer(lmm, port=0, max_batch=8, batch_window_ms=150)
    srv.start_background()
    try:
        results = []

        def hit(i):
            out = _post(srv.port, {"messages": [
                {"role": "user", "content": f"q{i}"}]})
            results.append(out["choices"][0]["message"]["content"])

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(results) == 6
        # 6 concurrent requests coalesce into far fewer dispatches
        assert srv.worker.dispatches <= 3
        assert max(lmm.batches) >= 2
    finally:
        srv.shutdown()


def test_review_fixes_gen_kwargs_grouping_and_multi_image():
    import threading

    class RecordingLMM(LMM):
        def __init__(self):
            self.calls = []

        def generate_until(self, requests):
            self.calls.append([r.args[1].get("max_new_tokens")
                               for r in requests])
            return ["r"] * len(requests)

        def loglikelihood(self, requests):
            return [(0.0, True)] * len(requests)

    lmm = RecordingLMM()
    srv = LMMServer(lmm, port=0, max_batch=8, batch_window_ms=200)
    srv.start_background()
    try:
        # different max_tokens must NOT share a dispatch (the adapter
        # reads gen kwargs from the first request of a chunk)
        outs = []

        def hit(mt):
            outs.append(_post(srv.port, {"max_tokens": mt, "messages": [
                {"role": "user", "content": "q"}]}))

        threads = [threading.Thread(target=hit, args=(mt,))
                   for mt in (4, 4, 512)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(outs) == 3
        assert sorted(map(sorted, lmm.calls)) == [[4, 4], [512]]

        # assistant history rides in the prompt
        seen = {}

        class Cap(LMM):
            def generate_until(self, requests):
                seen["prompt"] = requests[0].args[0]
                return ["x"] * len(requests)

            def loglikelihood(self, requests):
                return [(0.0, True)] * len(requests)

        srv2 = LMMServer(Cap(), port=0)
        srv2.start_background()
        try:
            _post(srv2.port, {"messages": [
                {"role": "user", "content": "what is this?"},
                {"role": "assistant", "content": "a cat"},
                {"role": "user", "content": "what color?"}]})
            assert "ASSISTANT: a cat" in seen["prompt"]

            # more than one image -> structured 400
            import base64
            from io import BytesIO
            from PIL import Image
            buf = BytesIO()
            Image.new("RGB", (4, 4)).save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            part = {"type": "image_url", "image_url": {
                "url": f"data:image/png;base64,{b64}"}}
            try:
                _post(srv2.port, {"messages": [
                    {"role": "user", "content": [part, part]}]})
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "one image" in json.loads(
                    e.read())["error"]["message"]
        finally:
            srv2.shutdown()
    finally:
        srv.shutdown()


def test_sse_streaming():
    lmm = CannedLMM()
    srv = LMMServer(lmm, model_name="tiny", port=0)
    srv.start_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/chat/completions",
            data=json.dumps({"stream": True, "messages": [
                {"role": "user", "content": "hello world"}]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            body = r.read().decode()
        events = [l[len("data: "):] for l in body.split("\n")
                  if l.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        assert chunks[0]["choices"][0]["delta"] == {"role": "assistant"}
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert text.startswith("ok:0img:hello world")
        assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    finally:
        srv.shutdown()


def test_inflight_server_matches_wave_server():
    """--inflight end to end: concurrent mixed-length requests through the
    continuous-batching slot engine return EXACTLY what the wave-batched
    server returns (both greedy on the same tiny LlavaLMM)."""
    import threading
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig)
    from PIL import Image

    vit_cfg = ViTConfig(image_size=224, patch_size=32, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    entry = TowerEntry(name="openai/clip-vit-large-patch14", kind="vit",
                       vit_config=vit_cfg, vit_family="clip",
                       hidden_size=16, num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=1000, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=FP32_PRECISION, batch_size=1)

    import base64
    from io import BytesIO

    def _data_url(im):
        buf = BytesIO()
        im.save(buf, format="PNG")
        return ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    img = Image.new("RGB", (32, 32), (90, 30, 200))
    prompts = ["describe the scene", "a much longer question about the "
               "contents of this image please", "short?"]

    def ask(port, prompt, out, i):
        out[i] = _post(port, {
            "model": "m", "max_tokens": 6,
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": prompt},
                {"type": "image_url", "image_url": {"url": _data_url(img)}},
            ]}]})["choices"][0]["message"]["content"]

    results = {}
    for mode in ("wave", "inflight"):
        srv = LMMServer(lmm, port=0, inflight=(mode == "inflight"),
                        inflight_kwargs={"n_slots": 2, "prompt_cap": 64,
                                         "gen_cap": 8, "chunk": 2})
        srv.start_background()
        try:
            out = [None] * len(prompts)
            threads = [threading.Thread(target=ask,
                                        args=(srv.port, p, out, i))
                       for i, p in enumerate(prompts)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert all(o is not None for o in out), out
            results[mode] = out
            if mode == "inflight":
                assert srv.worker.dispatches >= 1
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{srv.port}/health") as r:
                    h = json.loads(r.read())["inflight"]
                assert h["completions"] == len(prompts)
                assert h["tokens_out"] >= len(prompts)
                assert h["n_slots"] == 2 and h["active_slots"] == 0
        finally:
            srv.shutdown()
    assert results["inflight"] == results["wave"], results


def test_inflight_server_prefix_cache():
    """--inflight --prefix-cache over HTTP: the repeat of an identical
    request (same text + same image) admits from the prompt-KV store —
    identical answer, hit visible on /health."""
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig)
    import base64
    from io import BytesIO
    from PIL import Image

    vit_cfg = ViTConfig(image_size=224, patch_size=32, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    entry = TowerEntry(name="openai/clip-vit-large-patch14", kind="vit",
                       vit_config=vit_cfg, vit_family="clip",
                       hidden_size=16, num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=1000, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(1), cfg, FP32_PRECISION)
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=FP32_PRECISION, batch_size=1)
    buf = BytesIO()
    Image.new("RGB", (32, 32), (10, 120, 60)).save(buf, format="PNG")
    url = ("data:image/png;base64,"
           + base64.b64encode(buf.getvalue()).decode())
    payload = {"model": "m", "max_tokens": 6,
               "messages": [{"role": "user", "content": [
                   {"type": "text", "text": "what is shown here"},
                   {"type": "image_url", "image_url": {"url": url}}]}]}
    srv = LMMServer(lmm, port=0, inflight=True,
                    inflight_kwargs={"n_slots": 2, "prompt_cap": 64,
                                     "gen_cap": 8, "chunk": 2,
                                     "prefix_cache": 4})
    srv.start_background()
    try:
        a = _post(srv.port, payload)["choices"][0]["message"]["content"]
        b = _post(srv.port, payload)["choices"][0]["message"]["content"]
        assert a == b
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health") as r:
            h = json.loads(r.read())["inflight"]
        assert h["prefix_hits"] == 1 and h["prefix_entries"] == 1
    finally:
        srv.shutdown()


def test_inflight_sse_streams_live_tokens():
    """--inflight + stream: true — the SSE deltas come off the live decode
    (multiple content chunks) and concatenate to exactly the non-streamed
    answer."""
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig)

    vit_cfg = ViTConfig(image_size=224, patch_size=32, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    entry = TowerEntry(name="openai/clip-vit-large-patch14", kind="vit",
                       vit_config=vit_cfg, vit_family="clip",
                       hidden_size=16, num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=1000, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=FP32_PRECISION, batch_size=1)
    srv = LMMServer(lmm, port=0, inflight=True,
                    inflight_kwargs={"n_slots": 1, "prompt_cap": 64,
                                     "gen_cap": 16, "chunk": 2})
    srv.start_background()
    try:
        payload = {"max_tokens": 8, "messages": [
            {"role": "user", "content": "tell me something long"}]}
        plain = _post(srv.port, payload)["choices"][0]["message"]["content"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/chat/completions",
            data=json.dumps({**payload, "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            body = r.read().decode()
        events = [l[len("data: "):] for l in body.split("\n")
                  if l.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        content = [c["choices"][0]["delta"].get("content", "")
                   for c in chunks]
        streamed = "".join(content).strip()
        assert streamed == plain, (streamed, plain)
        # live per-token deltas, not one replayed blob
        assert sum(1 for c in content if c) >= 2, content
    finally:
        srv.shutdown()


def test_prompt_single_image_marker():
    """Serve-path contexts carry their own '<image>' marker; the adapter
    must not prepend a second one (one -200 sentinel per pixel batch —
    a duplicate spliced a junk token into every HTTP image request)."""
    from types import SimpleNamespace
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.data.preprocess import (
        tokenizer_image_token)
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IMAGE_TOKEN_INDEX)

    dummy = SimpleNamespace(template=get_template("v1"))
    tok = SimpleTokenizer()
    for ctx in ("<image>\nwhat is this", "sys preamble\n<image>\nquery",
                "plain text question"):
        prompt = LlavaLMM._prompt(dummy, ctx)
        ids = tokenizer_image_token(prompt, tok)
        n_markers = sum(1 for i in ids if i == IMAGE_TOKEN_INDEX)
        assert n_markers == 1, (ctx, n_markers)
