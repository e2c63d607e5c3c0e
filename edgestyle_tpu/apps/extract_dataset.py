"""Dataset extraction: photo/video frames → per-subject artifact folders.

TPU rebuild of /root/reference/extract_dataset.py:112-784:
  * person localization — the reference uses YOLOv5 via torch.hub (:54,
    :527-543); here the person box comes from the OpenPose detection
    itself (largest filtered pose, same anatomy gates), which removes the
    external YOLO dependency without changing downstream behaviour;
  * margin-crop to a square 512 around the person (create_processed_image
    :112-171 semantics: expand box by margin, squarify, clamp, crop,
    resize);
  * OpenPose skeleton render + keypoint json (:214-295);
  * SAM artifacts via pipelines.preprocess (masks, composites, :353-511);
  * CLIP-IQA top-K frame selection when scoring fns are provided
    (:656-753);
  * idempotent: existing subject dirs and `_skip_` markers are respected
    (:762-782).

Outputs per subject: processed/ openpose/ openpose_json/ subject/ mask/
agnostic/ head/ clothes/.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import numpy as np


def person_box_from_pose(keypoints: np.ndarray, margin: float = 0.2,
                         hw=(512, 512)) -> Optional[np.ndarray]:
    """Bounding box around valid keypoints with relative margin."""
    fin = np.isfinite(keypoints[:, 0])
    if fin.sum() < 2:
        return None
    xs, ys = keypoints[fin, 0], keypoints[fin, 1]
    w, h = xs.max() - xs.min(), ys.max() - ys.min()
    x0 = xs.min() - margin * w
    x1 = xs.max() + margin * w
    y0 = ys.min() - margin * h * 1.5  # headroom
    y1 = ys.max() + margin * h
    return np.array([max(0, x0), max(0, y0), min(hw[1], x1), min(hw[0], y1)])


def person_box_from_auto_masks(
    preproc,
    sam_params,
    img01: np.ndarray,
    points_per_side: int = 8,
    chunk: int = 16,
    pred_iou_thresh: float = 0.7,
    stability_thresh: float = 0.85,
    area_frac=(0.03, 0.9),
) -> Optional[np.ndarray]:
    """Person localization WITHOUT a pose (VERDICT r2 item 6).

    The reference localizes the person with YOLOv5 BEFORE pose detection
    (/root/reference/extract_dataset.py:54,527-543), so a frame whose
    person is too small for full-frame OpenPose still gets cropped — and
    pose detection then usually succeeds on the crop. This rebuild
    replaces YOLO with machinery already resident on the TPU: SAM
    automatic-mask candidates over a point grid
    (models/efficientvit/sam.py:413-487, the reference's automatic mask
    generator, efficientvit sam.py:460-514). The largest candidate whose
    area fraction is person-plausible (``area_frac`` — excludes
    background/wall near-full-frame masks and speckle) supplies the box.

    img01: square (S, S, 3) float [0,1]. Returns [x0,y0,x1,y1] float32 in
    the image frame, or None when no plausible candidate exists.
    """
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.models.efficientvit.sam import (
        automatic_mask_candidates,
        preprocess_sam_image,
        select_auto_masks,
    )
    from edgestyle_tpu.ops.morphology import mask_bbox

    sam = preproc.sam
    # cache the jitted candidate program on the preprocessor: a fresh
    # jax.jit(lambda ...) per frame would retrace+recompile every call
    key = f"_auto_cand_jit_{points_per_side}_{chunk}"
    fn = getattr(preproc, key, None)
    if fn is None:
        fn = jax.jit(lambda v, im: automatic_mask_candidates(
            sam, v, im, points_per_side=points_per_side, chunk=chunk))
        setattr(preproc, key, fn)

    img = preprocess_sam_image(jnp.asarray(img01, jnp.float32)[None])
    masks, iou, stab = fn({"params": sam_params["sam"]}, img)
    cands = select_auto_masks(
        masks, iou, stab, pred_iou_thresh=pred_iou_thresh,
        stability_thresh=stability_thresh,
    )
    mh = int(masks.shape[-1])
    n_px = mh * mh
    lo, hi = area_frac
    best, best_area = None, 0
    for c in cands:
        a = int(c["segmentation"].sum())
        if lo * n_px <= a <= hi * n_px and a > best_area:
            best, best_area = c["segmentation"], a
    if best is None:
        return None
    box = np.asarray(mask_bbox(jnp.asarray(best), margin=10), np.float32)
    h, w = img01.shape[:2]
    return box * np.array([w, h, w, h], np.float32) / mh


def margin_crop_square(img: np.ndarray, box: np.ndarray, out_size: int = 512) -> np.ndarray:
    """Expand the box to a square, clamp, crop, resize (reference
    create_processed_image :112-171)."""
    from edgestyle_tpu.data.transforms import resize_nearest

    h, w = img.shape[:2]
    x0, y0, x1, y1 = box
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    side = max(x1 - x0, y1 - y0)
    side = min(side, min(h, w))
    x0 = int(np.clip(cx - side / 2, 0, w - side))
    y0 = int(np.clip(cy - side / 2, 0, h - side))
    crop = img[y0 : y0 + int(side), x0 : x0 + int(side)]
    return resize_nearest(crop, (out_size, out_size))


def extract_subject(
    system,  # apps.tryon.TryOnSystem
    frames: List[np.ndarray],  # HWC uint8
    out_dir: str,
    top_k: Optional[int] = None,
    iqa=None,
    score_threshold: float = 0.5,
    skip_marker: str = "_skip_",
    stats: Optional[dict] = None,
) -> int:
    """Process frames into the artifact layout. Returns #frames written.

    Frames whose subject-head SAM score falls below ``score_threshold``
    are dropped (reference SUBJECT_SCORE_THRESHOLD=0.5,
    extract_dataset.py:34,391). ``top_k`` ranking uses
    mean(subject_score, CLIP-IQA of the subject composite) — the
    reference's score = mean(sam_scores, mean_score) (:699-714); without
    an ``iqa`` fn the SAM score alone ranks (the reference has no
    IQA-less mode). The reference's extra top-half random subsample for
    very long videos (:707-711) is replaced by a deterministic top-k.

    When ``stats`` is a dict it is filled with per-frame accounting,
    including how many pose-less frames the SAM auto-mask fallback
    recovered (``box_fallback``) vs dropped (``dropped_no_box``) — the
    frame-acceptance delta VERDICT r2 item 6 asks to surface."""
    if stats is None:
        stats = {}
    stats.update(box_from_pose=0, box_fallback=0, dropped_no_box=0,
                 dropped_no_pose_on_crop=0, dropped_low_score=0)
    if os.path.exists(os.path.join(out_dir, skip_marker)):
        return 0
    arts = ("processed", "openpose", "openpose_json", "subject", "mask",
            "agnostic", "head", "clothes")
    for a in arts:
        os.makedirs(os.path.join(out_dir, a), exist_ok=True)

    from PIL import Image

    import jax.numpy as jnp

    results = []
    for idx, frame in enumerate(frames):
        img01_full = frame.astype(np.float32) / 255.0
        from edgestyle_tpu.data.transforms import standard_image

        img512 = standard_image(frame)
        kp, skel = system.detect_pose(img512.astype(np.float32) / 255.0)
        box = person_box_from_pose(kp) if kp is not None else None
        if box is not None:
            stats["box_from_pose"] += 1
        else:
            # YOLO-equivalent fallback (reference crops BEFORE pose, so a
            # person too small for full-frame OpenPose is still kept): a
            # SAM auto-mask supplies the box; pose retries on the crop
            if getattr(system, "preproc", None) is not None and getattr(
                system, "sam_params", None
            ) is not None:
                box = person_box_from_auto_masks(
                    system.preproc, system.sam_params,
                    img512.astype(np.float32) / 255.0,
                )
            if box is None:
                stats["dropped_no_box"] += 1
                continue
            stats["box_fallback"] += 1
        processed = margin_crop_square(img512, box)
        kp2, skel2 = system.detect_pose(processed.astype(np.float32) / 255.0)
        if kp2 is None:
            # reference drops pose-less frames too (create_sam_images
            # returns all-None when openpose_json is None, :353-358, and
            # process_data filters them, :661-668)
            stats["dropped_no_pose_on_crop"] += 1
            continue
        ex = system.extract(processed.astype(np.float32) / 255.0, kp2)
        if ex.get("subject_score", 1.0) < score_threshold:
            stats["dropped_low_score"] += 1
            continue
        results.append((idx, processed, skel2, kp2, ex))

    if top_k is not None and len(results) > top_k:
        scores = []
        for p in results:
            ex = p[4]
            parts = []
            if "subject_score" in ex:
                parts.append(float(ex["subject_score"]))
            if iqa is not None:
                # reference scores the SUBJECT composite (:685-692)
                parts.append(float(
                    iqa(jnp.asarray(ex["subject"], jnp.float32)[None])[0]
                ))
            scores.append(float(np.mean(parts)) if parts else 0.0)
        if any(scores):
            order = np.argsort(scores)[::-1][:top_k]
            results = [results[i] for i in sorted(order)]
        else:
            # no ranking signal at all (extract() without subject_score and
            # no iqa): keep the FIRST top_k in frame order rather than
            # letting a reversed zero-tie argsort arbitrarily keep the last
            results = results[:top_k]

    for idx, processed, skel, kp, ex in results:
        name = f"{idx:06d}"
        Image.fromarray(processed).save(os.path.join(out_dir, "processed", name + ".jpg"))
        Image.fromarray((skel * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "openpose", name + ".jpg"))
        with open(os.path.join(out_dir, "openpose_json", name + ".json"), "w") as f:
            json.dump({"keypoints": np.where(np.isfinite(kp), kp, -1).tolist()}, f)
        for art, key in (("subject", "subject"), ("agnostic", "agnostic"),
                         ("head", "head"), ("clothes", "clothes")):
            Image.fromarray((ex[key] * 255).astype(np.uint8)).save(
                os.path.join(out_dir, art, name + ".jpg"))
        mask01 = (ex["agnostic"] != 127 / 255).any(axis=-1).astype(np.uint8) * 255
        Image.fromarray(np.stack([mask01] * 3, -1)).save(
            os.path.join(out_dir, "mask", name + ".jpg"))
    return len(results)


def load_frames(path: str, every_n: int = 1) -> List[np.ndarray]:
    """Directory of images, or a video file via cv2."""
    from PIL import Image

    if os.path.isdir(path):
        out = []
        for i, f in enumerate(sorted(os.listdir(path))):
            if i % every_n:
                continue
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                with Image.open(os.path.join(path, f)) as im:
                    out.append(np.asarray(im.convert("RGB")))
        return out
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % every_n == 0:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        i += 1
    cap.release()
    return frames


def main(argv=None):
    p = argparse.ArgumentParser(description="EdgeStyle-TPU dataset extraction")
    p.add_argument("--input", type=str, required=True, help="video file or image dir")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--every_n", type=int, default=5)
    p.add_argument("--top_k", type=int, default=None,
                   help="keep the best frames by mean(SAM subject score, "
                        "CLIP-IQA) — reference MAX_FRAMES selection "
                        "(:699-714); IQA needs --tokenizer_dir+--clip_model")
    p.add_argument("--score_threshold", type=float, default=0.5,
                   help="drop frames whose subject-head SAM score is below "
                        "this (reference SUBJECT_SCORE_THRESHOLD, :34)")
    p.add_argument("--tokenizer_dir", type=str, default=None)
    p.add_argument("--clip_model", type=str, default=None,
                   help="full CLIPModel dir enabling the CLIP-IQA half of "
                        "the frame ranking")
    p.add_argument("--random_init", action="store_true")
    from edgestyle_tpu.apps.tryon import add_model_source_args

    add_model_source_args(p)
    args = p.parse_args(argv)

    from edgestyle_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from edgestyle_tpu.apps.tryon import TryOnSystem

    iqa = None
    if args.tokenizer_dir and args.clip_model:
        from edgestyle_tpu.data.curation import (
            ClipIQA,
            EXTRACTION_PROMPT_PAIRS,
            _clip_encoders,
        )

        tok, enc_img, enc_txt = _clip_encoders(args.tokenizer_dir, args.clip_model)
        iqa = ClipIQA(tok, enc_img, enc_txt, EXTRACTION_PROMPT_PAIRS)

    system = TryOnSystem(random_init=args.random_init, args=args)
    frames = load_frames(args.input, args.every_n)
    stats: dict = {}
    n = extract_subject(system, frames, args.output_dir, top_k=args.top_k,
                        iqa=iqa, score_threshold=args.score_threshold,
                        stats=stats)
    print(json.dumps({"frames_in": len(frames), "frames_written": n, **stats}))


if __name__ == "__main__":
    main()
