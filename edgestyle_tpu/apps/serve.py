"""Serving layer — the reference's L5 (app.py Gradio Blocks on :7860,
Dockerfile:21). Two fronts:

  * a dependency-free HTTP server (stdlib) exposing POST /tryon with
    multipart images → PNG response, suitable for production probes;
  * a Gradio UI with the reference's preprocess + try_on two-step flow,
    mounted only when gradio is importable (it is not baked into this
    image; the reference's Jetson container ships it).

The heavy work happens in apps.tryon.TryOnSystem; the server keeps the
system warm so requests reuse compiled programs.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="EdgeStyle-TPU server")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)  # reference Dockerfile:21
    p.add_argument("--random_init", action="store_true")
    from edgestyle_tpu.apps.tryon import add_model_source_args

    add_model_source_args(p)
    p.add_argument("--tokenizer_dir", type=str, default=None,
                   help="CLIP tokenizer files (vocab.json/merges.txt); without "
                        "it prompts fall back to the BOS/EOS empty encoding")
    p.add_argument("--clip_model", type=str, default=None,
                   help="full CLIPModel dir enabling per-request prompt mining "
                        "from the clothes image (reference app.py:163)")
    p.add_argument("--prompt", type=str, default=None,
                   help="default prompt; per-request 'prompt' overrides. None → "
                        "mined (with --clip_model) or empty prompt")
    p.add_argument("--negative_prompt", type=str,
                   default="monochrome, lowres, bad anatomy, worst quality, low quality")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--guidance", type=float, default=3.5)
    return p.parse_args(argv)


def encode_prompts(tokenizer, miner, prompt, negative, clothes01):
    """(prompt_ids, negative_ids) for one request.

    No tokenizer → proper empty-prompt BOS/EOS encoding (NOT zeros: token 0
    is '!' in the CLIP vocab — ADVICE r1 medium). No explicit prompt but a
    miner → zero-shot mine from the clothes image, like the reference app.
    """
    import jax.numpy as jnp

    from edgestyle_tpu.data.tokenizer import empty_prompt_ids

    if tokenizer is None:
        if prompt:
            # don't silently generate unconditioned when the client asked
            # for a specific prompt — surface the misconfiguration
            raise ValueError(
                "server started without --tokenizer_dir: per-request "
                "'prompt' is unsupported (would be silently ignored)"
            )
        e = jnp.asarray(empty_prompt_ids())
        return e, e
    if prompt is None and miner is not None:
        prompt = miner(clothes01[None])[0]
    return (
        jnp.asarray(tokenizer([prompt or ""])),
        jnp.asarray(tokenizer([negative or ""])),
    )


def _png(arr01: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((arr01 * 255).astype(np.uint8)).save(buf, "PNG")
    return buf.getvalue()


def _read_image(data: bytes) -> np.ndarray:
    from PIL import Image

    from edgestyle_tpu.data.transforms import standard_image

    with Image.open(io.BytesIO(data)) as im:
        return standard_image(np.asarray(im.convert("RGB"))).astype(np.float32) / 255.0


class TryOnHandler(BaseHTTPRequestHandler):
    system = None  # injected
    tokenizer = None
    miner = None
    defaults = {"steps": 20, "guidance": 3.5, "prompt": None,
                "negative_prompt": ""}
    lock = threading.Lock()

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path == "/healthz":
            body = json.dumps({"ok": True}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        if self.path != "/tryon":
            self.send_response(404)
            self.end_headers()
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length))
            import base64

            subject = _read_image(base64.b64decode(payload["subject"]))
            c1 = _read_image(base64.b64decode(payload["clothes1"]))
            c2 = _read_image(base64.b64decode(payload["clothes2"]))
            steps = int(payload.get("steps", self.defaults["steps"]))
            guidance = float(payload.get("guidance", self.defaults["guidance"]))
            seed = int(payload.get("seed", 0))
            prompt = payload.get("prompt", self.defaults["prompt"])
            negative = payload.get(
                "negative_prompt", self.defaults["negative_prompt"]
            )

            with self.lock:  # one request at a time on the single chip —
                # prompt mining dispatches a CLIP forward, so it must be
                # inside the lock too (the tunneled chip wedges under
                # concurrent dispatch, CLAUDE.md)
                ids, neg = encode_prompts(
                    self.tokenizer, self.miner, prompt, negative, c1
                )
                out = self.system(subject, c1, c2, ids, neg, steps, guidance, seed)
            body = _png(out)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except Exception as e:  # noqa: BLE001 — report, don't crash the server
            body = json.dumps({"error": str(e)}).encode()
            self.send_response(400)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)


def _build_prompt_stack(args):
    tokenizer = miner = None
    if getattr(args, "tokenizer_dir", None):
        from edgestyle_tpu.data.tokenizer import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained_dir(args.tokenizer_dir)
        if getattr(args, "clip_model", None):
            from edgestyle_tpu.data.prompts import build_prompt_miner

            miner = build_prompt_miner(args.tokenizer_dir, args.clip_model)
    return tokenizer, miner


def build_server(args, system) -> ThreadingHTTPServer:
    handler = TryOnHandler
    handler.system = system
    handler.tokenizer, handler.miner = _build_prompt_stack(args)
    handler.defaults = {
        "steps": args.steps,
        "guidance": args.guidance,
        "prompt": getattr(args, "prompt", None),
        "negative_prompt": getattr(args, "negative_prompt", ""),
    }
    return ThreadingHTTPServer((args.host, args.port), handler)


def main(argv=None):
    args = parse_args(argv)
    from edgestyle_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from edgestyle_tpu.apps.tryon import TryOnSystem

    system = TryOnSystem(random_init=args.random_init, args=args)

    try:
        import gradio  # noqa: F401

        _launch_gradio(args, system)
        return
    except ImportError:
        pass

    srv = build_server(args, system)
    print(f"serving on http://{args.host}:{args.port} (POST /tryon, GET /healthz)")
    srv.serve_forever()


def _launch_gradio(args, system):  # pragma: no cover — gradio not in image
    import gradio as gr

    tokenizer, miner = _build_prompt_stack(args)

    def try_on(subject, c1, c2, prompt, negative, steps, guidance, seed):
        s = np.asarray(subject, np.float32) / 255.0
        a = np.asarray(c1, np.float32) / 255.0
        b = np.asarray(c2, np.float32) / 255.0
        ids, neg = encode_prompts(tokenizer, miner, prompt or None, negative, a)
        out = system(s, a, b, ids, neg, int(steps), float(guidance), int(seed))
        return (out * 255).astype(np.uint8)

    demo = gr.Interface(
        try_on,
        [gr.Image(), gr.Image(), gr.Image(),
         gr.Textbox(value=args.prompt or "", label="prompt (empty = mined)"),
         gr.Textbox(value=args.negative_prompt, label="negative prompt"),
         gr.Slider(1, 50, value=args.steps, label="steps"),
         gr.Slider(1.0, 12.0, value=args.guidance, label="guidance"),
         gr.Number(value=0, label="seed")],
        gr.Image(),
        title="EdgeStyle-TPU",
    )
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
