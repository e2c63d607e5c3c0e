"""Serving layer (real HTTP round-trip against the stdlib server with a
stub system) and dataset extraction on the tiny system."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from edgestyle_tpu.apps.extract_dataset import (
    extract_subject,
    load_frames,
    margin_crop_square,
    person_box_from_pose,
)
from edgestyle_tpu.apps.serve import build_server, parse_args


class StubSystem:
    def __call__(self, s, c1, c2, ids, neg, steps, guidance, seed):
        return np.clip(s * 0.5 + 0.25, 0, 1)


@pytest.fixture()
def server():
    args = parse_args(["--port", "0", "--random_init"])
    srv = build_server(args, StubSystem())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _b64_png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        assert json.loads(r.read())["ok"] is True


def test_tryon_roundtrip(server, rng):
    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    payload = json.dumps({
        "subject": _b64_png(img), "clothes1": _b64_png(img), "clothes2": _b64_png(img),
        "steps": 2,
    }).encode()
    req = urllib.request.Request(server + "/tryon", data=payload, method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "image/png"
        out = np.asarray(Image.open(io.BytesIO(r.read())))
    assert out.shape == (512, 512, 3)


def test_tryon_bad_payload(server):
    req = urllib.request.Request(
        server + "/tryon", data=b'{"subject": "!!"}', method="POST"
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_person_box_and_crop(rng):
    kp = np.full((18, 2), np.nan, np.float32)
    kp[0] = [250, 100]
    kp[10] = [280, 400]
    box = person_box_from_pose(kp)
    assert box is not None and box[0] < 250 and box[3] > 400
    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    crop = margin_crop_square(img, box)
    assert crop.shape == (512, 512, 3)
    assert person_box_from_pose(np.full((18, 2), np.nan)) is None


def test_load_frames_dir(tmp_path, rng):
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            tmp_path / f"f{i}.png"
        )
    frames = load_frames(str(tmp_path), every_n=2)
    assert len(frames) == 2


class StubExtractSystem:
    """Pose always found; extract returns gray-ish composites."""

    def detect_pose(self, img01):
        kp = np.full((18, 2), np.nan, np.float32)
        kp[[0, 2, 5, 8, 11]] = [[256, 100], [200, 180], [300, 180], [220, 300], [290, 300]]
        return kp, np.zeros((512, 512, 3), np.float32)

    def extract(self, img01, kp):
        g = {"subject": img01, "agnostic": img01 * 0 + 127 / 255,
             "head": img01, "clothes": img01}
        return g


def test_extract_subject(tmp_path, rng):
    frames = [rng.integers(0, 255, (600, 400, 3), dtype=np.uint8) for _ in range(3)]
    n = extract_subject(StubExtractSystem(), frames, str(tmp_path / "subj"))
    assert n == 3
    for art in ("processed", "openpose", "subject", "agnostic", "head", "clothes", "mask"):
        files = list((tmp_path / "subj" / art).iterdir())
        assert len(files) == 3, art

    # skip marker respected
    (tmp_path / "skip_subj").mkdir()
    (tmp_path / "skip_subj" / "_skip_").touch()
    assert extract_subject(StubExtractSystem(), frames, str(tmp_path / "skip_subj")) == 0
