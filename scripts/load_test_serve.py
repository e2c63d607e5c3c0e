"""Serve-path load test on the real chip (VERDICT r4 item 5).

Reference surface being validated: app.py:151-256 (the serving callbacks)
— here the production front is apps/serve.py's stdlib HTTP server with
dynamic request batching (BatchingTryOn). This script:

  1. starts the real server (port 0) over a full-size random-init
     TryOnSystem with --max_batch batching;
  2. drives it with N concurrent mixed requests (steps/seed/guidance
     variety → multiple batch groups, the scheduler's worst case);
  3. reports per-request p50/p95 latency and steady-state img/s;
  4. verifies batched ≡ sequential at full size: the same requests
     coalesced into ONE batched generation must match single-request
     generations exactly (the BatchingTryOn per-sample-guidance /
     per-request-seed contract, proven on the tiny pipe in
     tests/test_pipeline.py::test_batched_requests_match_sequential).

All device work stays on the batcher's single worker thread (tunnel wedge
rule, CLAUDE.md); the HTTP threads only decode payloads and wait.

Usage: python scripts/load_test_serve.py [--requests 8] [--max_batch 4]
           [--steps 20] [--mixed] [--skip_equality]
"""

import argparse
import base64
import concurrent.futures
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _b64_png(arr01):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((arr01 * 255).astype(np.uint8)).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, payload, timeout=1800):
    req = urllib.request.Request(
        url + "/tryon", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = r.read()
        assert r.status == 200, body[:200]
    return time.time() - t0, body


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--max_batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--mixed", action="store_true",
                    help="vary step counts across requests (every 4th "
                         "request runs at steps-5 → a second batch group)")
    ap.add_argument("--window_ms", type=float, default=150.0)
    ap.add_argument("--skip_equality", action="store_true",
                    help="skip the batched-vs-sequential full-size check")
    ap.add_argument("--skip_load", action="store_true",
                    help="skip the HTTP load phase (equality check only)")
    args = ap.parse_args()

    from edgestyle_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    from edgestyle_tpu.apps.serve import BatchingTryOn, build_server, parse_args
    from edgestyle_tpu.apps.tryon import TryOnSystem

    sargs = parse_args([
        "--port", "0", "--random_init",
        "--max_batch", str(args.max_batch),
        "--batch_window_ms", str(args.window_ms),
    ])
    system = TryOnSystem(random_init=True, args=sargs)
    srv = build_server(sargs, system)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    print(f"server up at {url}", flush=True)

    g = np.random.default_rng(0)
    photos = [g.random((512, 512, 3)).astype(np.float32) for _ in range(3)]
    payload0 = {
        "subject": _b64_png(photos[0]), "clothes1": _b64_png(photos[1]),
        "clothes2": _b64_png(photos[2]), "steps": args.steps, "seed": 0,
    }

    if not args.skip_load:
        # warmup / compile (B=1..max_batch programs compile lazily on
        # first use; fire max_batch concurrent warmups so the batched
        # program and the preprocessing programs are built before timing)
        t0 = time.time()
        with concurrent.futures.ThreadPoolExecutor(args.max_batch) as ex:
            futs = [ex.submit(_post, url, dict(payload0, seed=i))
                    for i in range(args.max_batch)]
            for f in futs:
                f.result()
        print(f"warmup done in {time.time() - t0:.1f}s", flush=True)

        # load phase: N concurrent mixed requests
        def req_payload(i):
            p = dict(payload0)
            p["seed"] = 100 + i
            p["guidance"] = 2.0 + (i % 4) * 0.5
            if args.mixed and i % 4 == 3:
                p["steps"] = max(2, args.steps - 5)
            return p

        lat = [None] * args.requests
        t0 = time.time()
        with concurrent.futures.ThreadPoolExecutor(args.requests) as ex:
            futs = {ex.submit(_post, url, req_payload(i)): i
                    for i in range(args.requests)}
            for f in concurrent.futures.as_completed(futs):
                lat[futs[f]] = f.result()[0]
        wall = time.time() - t0
        lat_s = sorted(lat)
        p50 = lat_s[len(lat_s) // 2]
        p95 = lat_s[min(len(lat_s) - 1, int(0.95 * len(lat_s)))]
        print(json.dumps({
            "metric": "serve_load_test", "requests": args.requests,
            "max_batch": args.max_batch, "steps": args.steps,
            "mixed_steps": bool(args.mixed),
            "p50_s": round(p50, 2), "p95_s": round(p95, 2),
            "wall_s": round(wall, 2),
            "steady_state_img_per_sec": round(args.requests / wall, 4),
        }), flush=True)

    if args.skip_equality:
        return

    # batched ≡ sequential at FULL SIZE: same knobs, one coalesced group
    # vs one-at-a-time generations through the same system
    batcher = BatchingTryOn(system, max_batch=args.max_batch,
                            window_s=0.5)
    n = args.max_batch
    outs_batched = [None] * n
    errs = []

    def submit(i):
        try:
            outs_batched[i] = batcher.submit(
                photos[0], photos[1], photos[2], None, "", args.steps,
                2.0 + 0.5 * i, 100 + i)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ths = [threading.Thread(target=submit, args=(i,)) for i in range(n)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not errs, errs

    from edgestyle_tpu.apps.serve import encode_prompts
    from edgestyle_tpu.utils.metrics import ssim

    import jax.numpy as jnp

    max_abs = 0.0
    min_ssim = 1.0
    for i in range(n):
        ids, neg = encode_prompts(None, None, None, "", photos[1])
        seq = system(photos[0], photos[1], photos[2], ids, neg, args.steps,
                     2.0 + 0.5 * i, 100 + i)
        a, b = np.asarray(seq), np.asarray(outs_batched[i])
        max_abs = max(max_abs, float(np.abs(a - b).max()))
        min_ssim = min(min_ssim, float(jnp.mean(ssim(
            jnp.asarray(a[None]), jnp.asarray(b[None])))))
    print(json.dumps({
        "metric": "serve_batched_vs_sequential_fullsize",
        "batch": n, "steps": args.steps,
        "max_abs_diff": max_abs, "min_ssim": round(min_ssim, 5),
    }), flush=True)
    # B=4 and B=1 are DIFFERENT XLA programs: bf16 tiling/reduction order
    # differs per batch shape, so bit equality only holds where the math
    # is deterministic (the fp32/CPU tiny-pipe test asserts it exactly);
    # at bf16 full size the contract is numeric equivalence.
    assert max_abs < 0.05 and min_ssim > 0.995, (max_abs, min_ssim)


if __name__ == "__main__":
    main()
