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
    p.add_argument("--use_agnostic_images", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="feed the agnostic crop to branch 0 instead of the "
                        "head crop (reference app.py preprocess returns the "
                        "head image; --use_agnostic_images is never set in "
                        "the published recipes)")
    p.add_argument("--steps", type=int, default=None,
                   help="denoise steps (default 20; --mode lcm defaults "
                        "to 4)")
    p.add_argument("--guidance", type=float, default=3.5)
    from edgestyle_tpu.apps.tryon import add_serving_mode_arg

    add_serving_mode_arg(p)
    p.add_argument("--controlnet_cache_interval", type=int, default=None,
                   help="refresh the six-branch ControlNet residuals every "
                        "k-th denoise step and reuse them in between "
                        "(opt-in latency/quality trade, BASELINE.md; 1 = "
                        "exact reference semantics)")
    p.add_argument("--unet_cache_interval", type=int, default=None,
                   help="recompute the UNet's deep levels every k-th denoise "
                        "step, splicing the cached deep feature back through "
                        "the high-res level in between (DeepCache-style "
                        "opt-in trade, BASELINE.md; 1 = exact)")
    p.add_argument("--controlnet_cache_steps", type=int, nargs="+",
                   default=None, metavar="STEP",
                   help="explicit ControlNet-residual refresh steps (must "
                        "include 0; non-uniform --controlnet_cache_interval; "
                        "mutually exclusive with the interval flag)")
    p.add_argument("--unet_cache_steps", type=int, nargs="+",
                   default=None, metavar="STEP",
                   help="explicit UNet deep-feature refresh steps (must "
                        "include 0; non-uniform --unet_cache_interval; "
                        "mutually exclusive with the interval flag)")
    p.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                   metavar=("START", "END"),
                   help="apply classifier-free guidance only inside this "
                        "step-fraction window; outside it the uncond half "
                        "is skipped (half-batch steps — opt-in "
                        "latency/quality trade, BASELINE.md; 0.0 1.0 = "
                        "exact)")
    p.add_argument("--tome", type=float, default=None,
                   help="ToMe token-merging ratio for the UNet/ControlNet "
                        "transformer blocks (arXiv:2303.17604; opt-in "
                        "latency/quality trade, BASELINE.md; 0 = exact)")
    p.add_argument("--max_batch", type=int, default=1,
                   help=">1 enables dynamic request batching: concurrent "
                        "requests coalesce into one batched generation")
    p.add_argument("--batch_window_ms", type=float, default=50.0,
                   help="how long the batcher waits for more requests "
                        "after the first arrives")
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
    batcher = None  # BatchingTryOn when --max_batch > 1
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

            if self.batcher is not None:
                # all device work happens on the batcher's worker thread;
                # concurrent requests coalesce into one batched generation
                out = self.batcher.submit(subject, c1, c2, prompt, negative,
                                          steps, guidance, seed)
            else:
                with self.lock:  # one request at a time on the single chip —
                    # prompt mining dispatches a CLIP forward, so it must be
                    # inside the lock too (the tunneled chip wedges under
                    # concurrent dispatch, CLAUDE.md)
                    ids, neg = encode_prompts(
                        self.tokenizer, self.miner, prompt, negative, c1
                    )
                    out = self.system(subject, c1, c2, ids, neg, steps,
                                      guidance, seed)
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


class BatchingTryOn:
    """Dynamic request batching for the HTTP front.

    Concurrent /tryon requests coalesce into one batched generation: the
    worker collects up to ``max_batch`` queued requests within
    ``window_s`` of the first, groups them by step count (steps is a
    static jit argument — different counts are different programs),
    preprocesses the group's photos in ONE batched pose + ONE batched SAM
    program (prepare_cond_batch), and runs ONE generate for the group with
    per-sample guidance and per-request seeds. Single-chip throughput at B=4 is ~14%
    over B=1 and the batch shards over chips via generate_dp (BASELINE.md);
    per-request results are identical to unbatched calls
    (tests/test_pipeline.py::test_batched_requests_match_sequential).

    ALL device work (prompt mining, preprocessing, generation) happens on
    the single worker thread — the tunneled chip wedges under concurrent
    dispatch (CLAUDE.md), so handler threads only decode payloads and wait.
    """

    def __init__(self, system, tokenizer=None, miner=None, max_batch=4,
                 window_s=0.05):
        import queue

        self.system = system
        self.tokenizer = tokenizer
        self.miner = miner
        self.max_batch = max_batch
        self.window_s = window_s
        self.q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, subject, c1, c2, prompt, negative, steps, guidance, seed):
        """Blocking: returns the [0,1] float image for this request."""
        done = threading.Event()
        req = {
            "subject": subject, "c1": c1, "c2": c2, "prompt": prompt,
            "negative": negative, "steps": int(steps),
            "guidance": float(guidance), "seed": int(seed),
            "done": done,
        }
        self.q.put(req)
        done.wait()
        if "error" in req:
            raise req["error"]
        return req["out"]

    def _collect(self):
        import queue
        import time

        first = self.q.get()
        batch = [first]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                batch.append(self.q.get(timeout=left))
            except queue.Empty:
                break
        return batch

    def _worker(self):
        import collections

        while True:
            batch = self._collect()
            # batched preprocessing for the WHOLE collected window (even
            # across step groups — steps only split the generation): one
            # pose program + one SAM program for all 3N photos. The
            # round-5 load test measured 6 serialized programs per request
            # (~9 s each) dominating end-to-end serving.
            if len(batch) > 1 and hasattr(self.system, "prepare_cond_batch"):
                try:
                    conds = self.system.prepare_cond_batch(
                        [r["subject"] for r in batch],
                        [r["c1"] for r in batch],
                        [r["c2"] for r in batch],
                    )
                    for r, c in zip(batch, conds):
                        r["cond"] = c
                except Exception:  # noqa: BLE001 — fall back to per-group
                    pass
            groups = collections.defaultdict(list)
            for r in batch:
                groups[r["steps"]].append(r)
            for steps, rs in groups.items():
                self._run_group(steps, rs)

    def _run_group(self, steps, rs):
        import jax.numpy as jnp

        try:
            ids, negs = [], []
            for r in rs:
                i, n = encode_prompts(self.tokenizer, self.miner, r["prompt"],
                                      r["negative"], r["c1"])
                ids.append(i)
                negs.append(n)
            # conds are usually precomputed for the whole collect window
            # in _worker (one batched pose + SAM pass); fill any missing
            # ones here (single-request windows, fallback paths, or test
            # doubles that expose only prepare_cond)
            missing = [r for r in rs if "cond" not in r]
            if len(missing) > 1 and hasattr(self.system, "prepare_cond_batch"):
                for r, c in zip(missing, self.system.prepare_cond_batch(
                        [r["subject"] for r in missing],
                        [r["c1"] for r in missing],
                        [r["c2"] for r in missing])):
                    r["cond"] = c
            for r in missing:
                r.setdefault("cond", self.system.prepare_cond(
                    r["subject"], r["c1"], r["c2"]))
            conds = [r["cond"] for r in rs]
            out = self.system.generate_batch(
                conds,
                jnp.concatenate(ids), jnp.concatenate(negs), steps=steps,
                guidance=[r["guidance"] for r in rs],
                seeds=[r["seed"] for r in rs],
            )
            for j, r in enumerate(rs):
                r["out"] = out[j]
        except Exception as e:  # noqa: BLE001 — fail the requests, not the worker
            for r in rs:
                # one exception INSTANCE per request: concurrent re-raises
                # of a shared instance cross-contaminate __traceback__
                r.setdefault("error", RuntimeError(f"{type(e).__name__}: {e}"))
        finally:
            for r in rs:
                r["done"].set()


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
    handler.batcher = None
    if getattr(args, "max_batch", 1) > 1:
        handler.batcher = BatchingTryOn(
            system, handler.tokenizer, handler.miner,
            max_batch=args.max_batch,
            window_s=getattr(args, "batch_window_ms", 50.0) / 1e3,
        )
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

    if args.max_batch > 1 and getattr(args, "exported_dir", None):
        raise SystemExit(
            "--max_batch > 1 requires the live pipeline; artifact serving "
            "(--exported_dir) is single-request"
        )
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


class GradioCallbacks:
    """The reference Gradio Blocks two-step flow (app.py:125-256) with the
    UI stripped out, so the callback wiring is unit-testable without
    importing gradio (VERDICT r2 item 8):

      preprocess(subject, cloth1, cloth2) → six uint8 conditioning images
        (agnostic, subject pose, clothes1, pose1, clothes2, pose2 —
        reference preprocess(), app.py:125-148)
      try_on(six images, scale, steps[, prompt, seed]) → uint8 try-on image
        (reference try_on(), app.py:151-183: prompt mined from the first
        clothes image when none given)
    """

    def __init__(self, system, tokenizer=None, miner=None,
                 default_prompt=None, negative_prompt=""):
        self.system = system
        self.tokenizer = tokenizer
        self.miner = miner
        self.default_prompt = default_prompt
        self.negative_prompt = negative_prompt

    @staticmethod
    def _to01(img_u8):
        from edgestyle_tpu.data.transforms import standard_image

        return standard_image(np.asarray(img_u8)).astype(np.float32) / 255.0

    @staticmethod
    def _to_u8(img01):
        return (np.clip(np.asarray(img01), 0.0, 1.0) * 255).astype(np.uint8)

    def preprocess(self, subject, cloth1, cloth2):
        outs = []
        # subject slot: head crop unless --use_agnostic_images (the
        # reference app.py preprocess returns head_image into the
        # "agnostic" Gradio slot, app.py:133,217)
        subj_key = "agnostic" if self.system.use_agnostic else "head"
        for img, key in ((subject, subj_key), (cloth1, "clothes"),
                         (cloth2, "clothes")):
            img01 = self._to01(img)
            kp, skel = self.system.detect_pose(img01)
            ex = self.system.extract(img01, kp)
            outs.append((ex[key], skel))
        (a, pa), (c1, p1), (c2, p2) = outs
        return tuple(self._to_u8(x) for x in (a, pa, c1, p1, c2, p2))

    def try_on(self, agnostic, subject_pose, clothes1, clothes1_pose,
               clothes2, clothes2_pose, scale, steps, prompt=None, seed=42):
        c1_01 = np.asarray(clothes1, np.float32) / 255.0
        ids, neg = encode_prompts(
            self.tokenizer, self.miner, prompt or self.default_prompt,
            self.negative_prompt, c1_01,
        )
        cond = {
            "agnostic": np.asarray(agnostic, np.float32) / 255.0,
            "subject_pose": np.asarray(subject_pose, np.float32) / 255.0,
            "clothes1": c1_01,
            "clothes1_pose": np.asarray(clothes1_pose, np.float32) / 255.0,
            "clothes2": np.asarray(clothes2, np.float32) / 255.0,
            "clothes2_pose": np.asarray(clothes2_pose, np.float32) / 255.0,
        }
        out = self.system.generate(cond, ids, neg, steps=int(steps),
                                   guidance=float(scale), seed=int(seed))
        return self._to_u8(out)


def _launch_gradio(args, system):  # pragma: no cover — gradio not in image
    import gradio as gr

    tokenizer, miner = _build_prompt_stack(args)
    cb = GradioCallbacks(system, tokenizer, miner,
                         default_prompt=getattr(args, "prompt", None),
                         negative_prompt=args.negative_prompt)

    with gr.Blocks(title="EdgeStyle-TPU") as demo:
        with gr.Row():
            inp = [gr.Image(label="Subject"), gr.Image(label="Clothes 1"),
                   gr.Image(label="Clothes 2")]
        btn_pre = gr.Button("Preprocess")
        with gr.Row():
            conds = [gr.Image(label=n) for n in
                     ("agnostic", "subject pose", "clothes 1", "pose 1",
                      "clothes 2", "pose 2")]
        scale = gr.Slider(1.0, 12.0, value=args.guidance, step=0.1,
                          label="Guidance Scale")
        steps = gr.Slider(1, 100, value=args.steps, step=1,
                          label="Inference Steps")
        btn_go = gr.Button("Try On")
        result = gr.Image(label="Result")
        btn_pre.click(cb.preprocess, inputs=inp, outputs=conds)
        btn_go.click(cb.try_on, inputs=conds + [scale, steps], outputs=[result])

    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
