"""OpenAI-compatible model server: ``lvr serve``.

The reference integrates serving through the sglang adapter
(`lmms_eval/models/llava_sglang.py` — spins up an sglang runtime and talks
to it over HTTP). Here serving is first-class instead of delegated: any
registered LMM (the JAX `LlavaLMM` included) is exposed behind a stdlib
``ThreadingHTTPServer`` speaking the chat-completions dialect our own
`openai-api` adapter (and any OpenAI client) emits:

- ``POST /v1/chat/completions`` — messages with interleaved text and
  ``image_url`` data-URL parts; returns one choice with the generation.
- ``GET /v1/models`` — single-model listing.
- ``GET /health`` — liveness.

Dispatch into the model is serialized with a lock (one TPU program at a
time); HTTP handling threads overlap so request parsing/image decode run
concurrently with device compute. max_tokens/temperature map onto the
generation kwargs the adapters already understand.
"""

from __future__ import annotations

import base64
import io
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

from .eval.api import Instance, LMM

_DATA_URL = re.compile(r"^data:image/[\w.+-]+;base64,(.*)$", re.DOTALL)


def _parse_messages(messages: List[dict]):
    """Flatten chat messages into (prompt, images): text parts join in
    order, each image part becomes an '<image>' marker + a PIL image —
    the inverse of the `openai-api` adapter's payload builder
    (`eval/models_registry.py` _payload)."""
    from PIL import Image
    texts: List[str] = []
    images = []
    for msg in messages:
        if msg.get("role") not in ("user", "system"):
            continue
        content = msg.get("content", "")
        if isinstance(content, str):
            texts.append(content)
            continue
        for part in content:
            if part.get("type") == "text":
                texts.append(part.get("text", ""))
            elif part.get("type") == "image_url":
                url = part["image_url"]["url"] if \
                    isinstance(part.get("image_url"), dict) else \
                    part.get("image_url", "")
                m = _DATA_URL.match(url)
                if not m:
                    raise ValueError(
                        "only data:image/...;base64 image_url parts are "
                        "supported (no egress from the server)")
                img = Image.open(io.BytesIO(
                    base64.b64decode(m.group(1)))).convert("RGB")
                images.append(img)
                texts.append("<image>")
    return "\n".join(t for t in texts if t), images


class LMMServer:
    """Serve one LMM instance over HTTP until ``shutdown()``."""

    def __init__(self, lmm: LMM, model_name: str = "lvr",
                 host: str = "127.0.0.1", port: int = 8000):
        self.lmm = lmm
        self.model_name = model_name
        self._lock = threading.Lock()
        self._count = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, {"status": "ok",
                                     "requests": outer._count})
                elif self.path == "/v1/models":
                    self._send(200, {"object": "list", "data": [
                        {"id": outer.model_name, "object": "model"}]})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path.rstrip("/") != "/v1/chat/completions":
                    self._send(404, {"error": "not found"})
                    return
                try:
                    req = json.loads(self.rfile.read(
                        int(self.headers["Content-Length"])))
                    prompt, images = _parse_messages(req["messages"])
                    gen_kwargs = {}
                    if "max_tokens" in req:
                        gen_kwargs["max_new_tokens"] = int(
                            req["max_tokens"])
                    if "temperature" in req:
                        gen_kwargs["temperature"] = float(
                            req["temperature"])
                    inst = Instance("generate_until", {}, 0,
                                    "serve", (prompt, gen_kwargs),
                                    visual=images or None)
                    with outer._lock:     # one device program at a time
                        text = outer.lmm.generate_until([inst])[0]
                        outer._count += 1
                    self._send(200, {
                        "id": f"chatcmpl-{outer._count}",
                        "object": "chat.completion",
                        "model": outer.model_name,
                        "choices": [{
                            "index": 0,
                            "message": {"role": "assistant",
                                        "content": text},
                            "finish_reason": "stop"}],
                    })
                except Exception as e:  # noqa: BLE001 — surface as 400
                    self._send(400, {"error": {"message": str(e),
                                               "type": type(e).__name__}})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_port

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()


def run_server(cfg, *, model: str = "llava", model_args: Optional[dict]
               = None, host: str = "127.0.0.1", port: int = 8000,
               model_name: Optional[str] = None) -> LMMServer:
    """CLI entry: build the adapter like `eval/runner.run_evaluation` does
    and serve it."""
    if model == "llava":
        from .eval.runner import build_lmm
        lmm = build_lmm(cfg)
    else:
        from .eval.models_registry import build_lmm_by_name
        lmm = build_lmm_by_name(model, **(model_args or {}))
    return LMMServer(lmm, model_name=model_name or model,
                     host=host, port=port)
