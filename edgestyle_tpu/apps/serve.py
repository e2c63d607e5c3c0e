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
    p.add_argument("--pretrained_model", type=str, default=None)
    p.add_argument("--vae", type=str, default=None)
    p.add_argument("--openpose_controlnet", type=str, default=None)
    p.add_argument("--edgestyle_checkpoint", type=str, default=None)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--guidance", type=float, default=3.5)
    return p.parse_args(argv)


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
    defaults = {"steps": 20, "guidance": 3.5}
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

            import jax.numpy as jnp

            ids = jnp.zeros((1, 77), jnp.int32)
            with self.lock:  # one generation at a time on the single chip
                out = self.system(subject, c1, c2, ids, ids, steps, guidance, seed)
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


def build_server(args, system) -> ThreadingHTTPServer:
    handler = TryOnHandler
    handler.system = system
    handler.defaults = {"steps": args.steps, "guidance": args.guidance}
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

    def try_on(subject, c1, c2, steps, guidance, seed):
        import jax.numpy as jnp

        ids = jnp.zeros((1, 77), jnp.int32)
        s = np.asarray(subject, np.float32) / 255.0
        a = np.asarray(c1, np.float32) / 255.0
        b = np.asarray(c2, np.float32) / 255.0
        out = system(s, a, b, ids, ids, int(steps), float(guidance), int(seed))
        return (out * 255).astype(np.uint8)

    demo = gr.Interface(
        try_on,
        [gr.Image(), gr.Image(), gr.Image(),
         gr.Slider(1, 50, value=args.steps, label="steps"),
         gr.Slider(1.0, 12.0, value=args.guidance, label="guidance"),
         gr.Number(value=0, label="seed")],
        gr.Image(),
        title="EdgeStyle-TPU",
    )
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
