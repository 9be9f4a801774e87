#!/usr/bin/env python3
"""Split a NeRF dataset's transforms.json into train/test sets for the
reference's held-out eval protocol (ref: run.py:216-303 — train on the
train split, then PSNR/SSIM on the held-out views at spp 8, black
background, snap-to-pixel-centers).

    python scripts/make_holdout_split.py /root/reference/data/nerf/fox \
        --out /tmp/fox_split --every 8
"""
import argparse
import json
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scene")
    p.add_argument("--out", required=True)
    p.add_argument("--every", type=int, default=8,
                   help="every k-th frame goes to the test split")
    args = p.parse_args()

    scene = Path(args.scene)
    jpath = scene / "transforms.json" if scene.is_dir() else scene
    cfg = json.loads(jpath.read_text())
    frames = sorted(cfg.get("frames", []),
                    key=lambda f: f.get("file_path", ""))
    base = jpath.parent.resolve()
    for fr in frames:
        fp = Path(fr["file_path"])
        if not fp.is_absolute():
            fr["file_path"] = str((base / fp).resolve())

    test = [f for i, f in enumerate(frames) if i % args.every == 0]
    train = [f for i, f in enumerate(frames) if i % args.every != 0]

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for name, fs in (("transforms_train", train), ("transforms_test", test)):
        doc = {k: v for k, v in cfg.items() if k != "frames"}
        doc["frames"] = fs
        (out / f"{name}.json").write_text(json.dumps(doc, indent=1))
    print(f"{len(train)} train / {len(test)} test → {out}")


if __name__ == "__main__":
    main()
