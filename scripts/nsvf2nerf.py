#!/usr/bin/env python3
"""NSVF dataset → transforms.json converter (workflow parity with the
reference's scripts/nsvf2nerf.py): NSVF scenes store one 4x4 pose text
file per image plus a shared intrinsics.txt."""
import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", required=True, help="NSVF scene directory")
    p.add_argument("--aabb_scale", type=int, default=4)
    p.add_argument("--out", default="transforms.json")
    args = p.parse_args()
    scene = Path(args.scene)

    intr = (scene / "intrinsics.txt").read_text().split()
    focal = float(intr[0])
    cx, cy = float(intr[2]), float(intr[1 + 5]) if len(intr) > 6 else (0, 0)

    frames = []
    for pose_file in sorted((scene / "pose").glob("*.txt")):
        m = np.loadtxt(pose_file).reshape(4, 4)
        # NSVF camera looks down +z with y up → NeRF convention flip
        m[:3, 1:3] *= -1
        img = scene / "rgb" / (pose_file.stem + ".png")
        frames.append({"file_path": str(img),
                       "transform_matrix": m.tolist()})
    if not frames:
        raise SystemExit("no poses found")
    from PIL import Image
    with Image.open(frames[0]["file_path"]) as im:
        w, h = im.size
    out = {"fl_x": focal, "fl_y": focal, "cx": cx or w / 2, "cy": cy or h / 2,
           "w": w, "h": h, "aabb_scale": args.aabb_scale,
           "camera_angle_x": math.atan(w / (2 * focal)) * 2,
           "frames": frames}
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out} with {len(frames)} frames")


if __name__ == "__main__":
    sys.exit(main())
