"""Segmenter finetuning driver — the four reference trainers
(/root/reference/segmenter_training_{subject,head,clothes,body}.py) as ONE
CLI parameterized by --head (they differ only in KEEP_CATEGORIES subsets
and output paths).

Reference behavior mirrored (segmenter_training_subject.py):
  * dataset: human-parsing image/label pairs; 99/1 train/val split (:419-423)
    — here read from a local folder (images/ + masks/ with matching stems)
    since the HF hub is unreachable in this image;
  * train only the mask decoder against box prompts jittered ±30px with
    DiceCE loss, Prodigy lr=1.0 (:145-147, :126-130, :385-394);
  * per-epoch TensorBoard mask overlay grids (:296-358);
  * best checkpoint (lowest train loss) exported as the decoder subtree
    (:438-444 ModelCheckpoint(monitor='train_loss') + :463-464 torch.save)
    → trained_decoder_{head}.safetensors. For tryon/serve, pass it as
    --sam_subject/--sam_agnostic/--sam_clothes/--sam_head; the body-trained
    decoder drives the agnostic mask (--sam_agnostic), mirroring the
    reference's body→agnostic model use (extract_dataset.py:44-49).

Usage:
  python -m edgestyle_tpu.apps.train_segmenter --head clothes \
      --dataset_dir ./parsing_data --sam_checkpoint l2.pt --output_dir out/
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="EdgeStyle-TPU segmenter finetuner")
    p.add_argument("--head", type=str, default="subject",
                   choices=["subject", "head", "clothes", "body"])
    p.add_argument("--dataset_dir", type=str, default=None,
                   help="folder with images/ and masks/ (matching stems; "
                        "masks are uint8 parsing-label PNGs)")
    p.add_argument("--sam_checkpoint", type=str, default=None,
                   help="base EfficientViT-SAM weights (.pt or .safetensors)")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--epochs", type=int, default=20)  # reference Trainer max_epochs
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--val_fraction", type=float, default=0.01)  # 99/1 split
    p.add_argument("--learning_rate", type=float, default=1.0)
    p.add_argument("--box_jitter", type=int, default=30)
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop early after N optimizer steps (0 = full run)")
    p.add_argument("--overlay_samples", type=int, default=4)
    p.add_argument("--output_dir", type=str, default="./segmenter-out")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def load_parsing_folder(root: str, image_size: int):
    """images/ + masks/ folders → (images01 (N,S,S,3) fp32, labels (N,S,S)
    int32), SamResize semantics: longest side → image_size, corner pad
    (reference SamResize/SamPad, efficientvit sam.py:51-106)."""
    from PIL import Image

    img_dir, mask_dir = os.path.join(root, "images"), os.path.join(root, "masks")
    stems = sorted(
        os.path.splitext(f)[0] for f in os.listdir(img_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    imgs, labs = [], []
    for stem in stems:
        ipath = next(
            os.path.join(img_dir, stem + ext)
            for ext in (".png", ".jpg", ".jpeg")
            if os.path.isfile(os.path.join(img_dir, stem + ext))
        )
        mpath = os.path.join(mask_dir, stem + ".png")
        with Image.open(ipath) as im:
            im = im.convert("RGB")
            scale = image_size / max(im.size)
            nw, nh = round(im.width * scale), round(im.height * scale)
            arr = np.asarray(im.resize((nw, nh), Image.BILINEAR), np.float32) / 255.0
        with Image.open(mpath) as mm:
            lab = np.asarray(mm.resize((nw, nh), Image.NEAREST), np.int32)
            if lab.ndim == 3:
                lab = lab[..., 0]
        canvas = np.zeros((image_size, image_size, 3), np.float32)
        canvas[:nh, :nw] = arr
        lcanvas = np.zeros((image_size, image_size), np.int32)
        lcanvas[:nh, :nw] = lab
        imgs.append(canvas)
        labs.append(lcanvas)
    if not imgs:
        raise SystemExit(f"no images under {img_dir}")
    return np.stack(imgs), np.stack(labs)


def overlay_grid(images01, target, pred):
    """(B,S,S,3)+2×(B,S,S) → one (S, B·S, 3) row: image tinted green where
    GT, red where prediction (the reference's per-epoch TensorBoard
    artifact, segmenter_training_subject.py:296-358)."""
    out = []
    for img, t, pr in zip(images01, target, pred):
        o = img.copy()
        o[..., 1] = np.where(t, 0.6 * o[..., 1] + 0.4, o[..., 1])
        o[..., 0] = np.where(pr, 0.6 * o[..., 0] + 0.4, o[..., 0])
        out.append(o)
    return np.concatenate(out, axis=1)


def main(argv=None, sam_cfg=None):
    """`sam_cfg`: SamConfig override for tests (default: the production
    SAM_L2, the architecture all five reference checkpoints use)."""
    args = parse_args(argv)
    from edgestyle_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.models.efficientvit.sam import (
        SAM_L2,
        EfficientViTSam,
        postprocess_masks,
        preprocess_sam_image,
    )
    from edgestyle_tpu.training.checkpoint import export_safetensors
    from edgestyle_tpu.training.segmenter import (
        SegmenterTrainConfig,
        binary_target,
        init_segmenter_state,
        jittered_box,
        make_segmenter_train_step,
    )

    cfg = sam_cfg if sam_cfg is not None else SAM_L2
    sam = EfficientViTSam(cfg)
    rng = jax.random.key(args.seed)

    if args.random_init or not args.sam_checkpoint:
        img0 = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        frozen = jax.jit(sam.init)(
            rng, img0, jnp.zeros((1, 2, 2)), jnp.array([[2, 3]])
        )["params"]
    else:
        from edgestyle_tpu.core import porting
        from edgestyle_tpu.models.efficientvit.sam import port_sam_state_dict

        frozen = porting.unflatten(
            port_sam_state_dict(porting.load_state_dict(args.sam_checkpoint), cfg)
        )

    tcfg = SegmenterTrainConfig(
        head=args.head, learning_rate=args.learning_rate, box_jitter=args.box_jitter
    )
    state = init_segmenter_state(frozen, tcfg)
    step_fn = jax.jit(make_segmenter_train_step(sam, tcfg))

    # data
    if args.dataset_dir:
        images01, labels = load_parsing_folder(args.dataset_dir, cfg.image_size)
    else:  # synthetic smoke data
        g = np.random.default_rng(args.seed)
        images01 = g.random((8, cfg.image_size, cfg.image_size, 3), np.float32)
        labels = np.zeros((8, cfg.image_size, cfg.image_size), np.int32)
        s = cfg.image_size
        labels[:, s // 4: 3 * s // 4, s // 4: 3 * s // 4] = 5  # a "clothes" block
        labels[:, s // 8: s // 4, 3 * s // 8: 5 * s // 8] = 2  # a "hair" block
    n_val = max(1, int(len(images01) * args.val_fraction)) if len(images01) > 1 else 0
    val_images, val_labels = images01[:n_val], labels[:n_val]
    images01, labels = images01[n_val:], labels[n_val:]
    if len(images01) < args.batch_size:
        raise SystemExit(
            f"training set after the val split has {len(images01)} examples "
            f"< --batch_size {args.batch_size}: every epoch would run zero "
            f"steps. Add data or lower --batch_size."
        )
    print(json.dumps({"train": len(images01), "val": int(n_val), "head": args.head}),
          flush=True)

    os.makedirs(args.output_dir, exist_ok=True)
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(args.output_dir, "logs"))
    except Exception:
        writer = None

    # jitted overlay predictor (box from GT, no jitter — the reference's
    # validation_step path)
    prompt_scale = cfg.prompt_input_size / cfg.image_size

    # frozen passed as an argument: closing over the full SAM tree would
    # bake it into the HLO as constants (remote-compile HTTP 413 on the
    # tunneled TPU — CLAUDE.md)
    @jax.jit
    def predict(fz, decoder, img01, labs):
        x = preprocess_sam_image(img01)
        emb = sam.apply({"params": fz}, x, method="encode_image")
        t = binary_target(labs, args.head)
        pts, lbls = jax.vmap(
            lambda m: jittered_box(m, jax.random.key(0), 0, prompt_scale)
        )(t)
        p = {**fz, "mask_decoder": decoder}
        masks, _ = sam.apply({"params": p}, emb, pts, lbls, method="decode",
                             multimask_output=False)
        logits = postprocess_masks(masks.astype(jnp.float32), img01.shape[1:3])[:, 0]
        return logits > 0, t

    g = np.random.default_rng(args.seed)
    best = {"loss": float("inf"), "epoch": -1}
    gstep = 0
    t0 = time.time()
    done = False
    for epoch in range(args.epochs):
        order = g.permutation(len(images01))
        losses = []
        for i0 in range(0, len(order) - args.batch_size + 1, args.batch_size):
            idx = order[i0: i0 + args.batch_size]
            batch = {
                "image": jnp.asarray(
                    preprocess_sam_image(jnp.asarray(images01[idx]))
                ),
                "labels": jnp.asarray(labels[idx]),
            }
            rng, r = jax.random.split(rng)
            state, metrics = step_fn(state, frozen, batch, r)
            losses.append(float(metrics["loss"]))
            gstep += 1
            if args.max_steps and gstep >= args.max_steps:
                done = True
                break
        ep_loss = float(np.mean(losses)) if losses else float("nan")
        print(json.dumps({"epoch": epoch, "train_loss": round(ep_loss, 4),
                          "step": gstep, "elapsed_s": round(time.time() - t0, 1)}),
              flush=True)
        if writer:
            writer.add_scalar("train_loss", ep_loss, epoch)

        # per-epoch overlay grid
        k = min(args.overlay_samples, len(images01))
        if k and writer:
            pred, t = predict(frozen, state["decoder"], jnp.asarray(images01[:k]),
                              jnp.asarray(labels[:k]))
            grid = overlay_grid(images01[:k], np.asarray(t), np.asarray(pred))
            writer.add_image(f"overlay_{args.head}", grid, epoch,
                             dataformats="HWC")

        if ep_loss < best["loss"]:
            best = {"loss": ep_loss, "epoch": epoch}
            export_safetensors(
                os.path.join(args.output_dir,
                             f"trained_decoder_{args.head}.safetensors"),
                state["decoder"],
            )
        if done:
            break

    if writer:
        writer.close()
    print(json.dumps({"done": True, "best_epoch": best["epoch"],
                      "best_loss": round(best["loss"], 4), "steps": gstep}),
          flush=True)


if __name__ == "__main__":
    main()
