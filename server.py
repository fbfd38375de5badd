"""Minimal HTTP inference server (std-lib only).

A production-shaped front-end over the same engine the CLI and Streamlit app
use: POST an image + prompt, get the generated text. Complements the
reference's Streamlit UI (reference: app.py) with a programmatic surface.

Endpoints:
  GET  /healthz            -> {"status": "ok", "model": "...", "device": "..."}
  POST /generate           -> {"text": ..., "tokens": [...], "num_tokens": N}
      JSON body: {"prompt": str, "image_b64": base64-encoded image bytes,
                  "max_tokens": int=100, "temperature": float=0.8,
                  "top_p": float=0.9, "do_sample": bool=false}

Run: ``python server.py [--model_path PATH | --demo] [--port 8000]``.
Requests are served sequentially (one TPU, one model instance); decoding
uses the chunked compiled path (generation.generate_chunked).
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class Engine:
    """Loaded model + processor with a serial inference lock."""

    def __init__(self, model_path=None, demo=True):
        from inference import load_for_cli

        self.params, self.cfg, self.processor = load_for_cli(model_path, demo)
        self.model_name = model_path or "demo-tiny-random"
        self.lock = threading.Lock()

    def generate(self, prompt, image, max_tokens, temperature, top_p, do_sample):
        import jax
        import jax.numpy as jnp

        from paligemma_tpu import generation

        inputs = self.processor(text=[prompt], images=[image])
        ids = jnp.asarray(inputs["input_ids"])
        dtype = jax.tree.leaves(self.params)[0].dtype
        if hasattr(dtype, "name") and dtype.name.startswith("int"):
            dtype = jnp.bfloat16
        pix = jnp.asarray(inputs["pixel_values"], dtype)
        with self.lock:
            tokens = generation.generate_chunked(
                self.params, self.cfg, ids, pix,
                max_new_tokens=max_tokens,
                eos_token_id=self.processor.tokenizer.eos_token_id,
                do_sample=do_sample, temperature=temperature, top_p=top_p,
                cache_dtype=dtype,
            )
        text = self.processor.tokenizer.decode(tokens, skip_special_tokens=True)
        return {"text": prompt + text, "tokens": tokens, "num_tokens": len(tokens)}


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {
                    "status": "ok",
                    "model": engine.model_name,
                    "device": str(jax.devices()[0]),
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                return self._send(404, {"error": f"unknown path {self.path}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                prompt = req["prompt"]
                from PIL import Image

                image = Image.open(
                    io.BytesIO(base64.b64decode(req["image_b64"]))
                ).convert("RGB")
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._send(400, {"error": f"bad request: {e!r}"})
            except Exception as e:
                return self._send(400, {"error": f"bad image: {e!r}"})
            try:
                out = engine.generate(
                    prompt,
                    image,
                    int(req.get("max_tokens", 100)),
                    float(req.get("temperature", 0.8)),
                    float(req.get("top_p", 0.9)),
                    bool(req.get("do_sample", False)),
                )
                self._send(200, out)
            except Exception as e:  # surfacing engine errors as 500s
                self._send(500, {"error": repr(e)})

        def log_message(self, fmt, *args):  # route to stderr, keep stdout clean
            print(f"[server] {fmt % args}", file=sys.stderr)

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--demo", action="store_true")
    p.add_argument("--only_cpu", action="store_true")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)

    if args.only_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    engine = Engine(args.model_path, demo=args.demo or not args.model_path)

    # Warm-up: pay the jit compiles before accepting traffic so the first
    # request is fast.
    try:
        from PIL import Image

        size = engine.cfg.vision_config.image_size
        engine.generate(
            "warmup", Image.new("RGB", (size, size)), 4, 0.0, 0.9, False
        )
        print("warm-up complete", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        print(f"warm-up failed: {e!r}", file=sys.stderr, flush=True)

    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(engine))
    print(f"serving on http://127.0.0.1:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
