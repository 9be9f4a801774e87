#!/usr/bin/env python3
"""COLMAP → transforms.json converter (workflow-compatible with the
reference's scripts/colmap2nerf.py): optional ffmpeg frame extraction and
COLMAP SfM invocation, then conversion of the TXT model with the same
scene auto-centering recipe — reorient the up vector, translate the
camera-ray closest-point centroid to the origin, scale so the average
camera distance is 4 (paired with aabb_scale in transforms.json).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_in", default="")
    p.add_argument("--video_fps", type=float, default=2.0)
    p.add_argument("--images", default="images")
    p.add_argument("--text", default="colmap_text",
                   help="dir with cameras.txt/images.txt (COLMAP TXT model)")
    p.add_argument("--run_colmap", action="store_true")
    p.add_argument("--colmap_matcher", default="sequential")
    p.add_argument("--colmap_db", default="colmap.db")
    p.add_argument("--aabb_scale", type=int, default=16)
    p.add_argument("--skip_early", type=int, default=0)
    p.add_argument("--keep_colmap_coords", action="store_true")
    p.add_argument("--out", default="transforms.json")
    return p.parse_args()


def run_ffmpeg(args):
    Path(args.images).mkdir(exist_ok=True)
    subprocess.run(["ffmpeg", "-i", args.video_in, "-qscale:v", "1",
                    "-qmin", "1", "-vf", f"fps={args.video_fps}",
                    f"{args.images}/%04d.jpg"], check=True)


def run_colmap(args):
    db = args.colmap_db
    subprocess.run(["colmap", "feature_extractor", "--database_path", db,
                    "--image_path", args.images,
                    "--ImageReader.camera_model", "OPENCV",
                    "--ImageReader.single_camera", "1"], check=True)
    subprocess.run(["colmap", f"{args.colmap_matcher}_matcher",
                    "--database_path", db], check=True)
    Path("colmap_sparse").mkdir(exist_ok=True)
    subprocess.run(["colmap", "mapper", "--database_path", db,
                    "--image_path", args.images,
                    "--output_path", "colmap_sparse"], check=True)
    subprocess.run(["colmap", "bundle_adjuster", "--input_path",
                    "colmap_sparse/0", "--output_path", "colmap_sparse/0",
                    "--BundleAdjustment.refine_principal_point", "1"],
                   check=True)
    Path(args.text).mkdir(exist_ok=True)
    subprocess.run(["colmap", "model_converter", "--input_path",
                    "colmap_sparse/0", "--output_path", args.text,
                    "--output_type", "TXT"], check=True)


def qvec2rotmat(q):
    """COLMAP (w, x, y, z) quaternion → rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])


def sharpness(image_path) -> float:
    """Variance of Laplacian (ref uses cv2; fall back to a numpy kernel)."""
    try:
        import cv2
        img = cv2.imread(str(image_path))
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return float(cv2.Laplacian(gray, cv2.CV_64F).var())
    except Exception:
        from PIL import Image
        from scipy.ndimage import laplace
        with Image.open(image_path) as im:
            g = np.asarray(im.convert("L"), np.float64)
        return float(laplace(g).var())


def rotmat_between(a, b):
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.linalg.norm(v) < 1e-10:
        return np.eye(3) if c > 0 else -np.eye(3)
    s = np.linalg.norm(v)
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + K + K @ K * ((1 - c) / (s ** 2))


def closest_point_2_lines(oa, da, ob, db):
    """Point closest to both rays + weight (parallel rays weigh 0)."""
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    if ta > 0:
        ta = 0
    if tb > 0:
        tb = 0
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def main():
    args = parse_args()
    if args.video_in:
        run_ffmpeg(args)
    if args.run_colmap:
        run_colmap(args)

    text = Path(args.text)
    cam_lines = [l for l in (text / "cameras.txt").read_text().splitlines()
                 if l and not l.startswith("#")]
    # single camera assumed (like the reference's default workflow)
    parts = cam_lines[0].split()
    model = parts[1]
    w, h = float(parts[2]), float(parts[3])
    p = [float(x) for x in parts[4:]]
    out = {"w": w, "h": h, "aabb_scale": args.aabb_scale,
           "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0}
    if model == "SIMPLE_PINHOLE":
        out.update(fl_x=p[0], fl_y=p[0], cx=p[1], cy=p[2])
    elif model == "PINHOLE":
        out.update(fl_x=p[0], fl_y=p[1], cx=p[2], cy=p[3])
    elif model == "SIMPLE_RADIAL":
        out.update(fl_x=p[0], fl_y=p[0], cx=p[1], cy=p[2], k1=p[3])
    elif model == "RADIAL":
        out.update(fl_x=p[0], fl_y=p[0], cx=p[1], cy=p[2], k1=p[3], k2=p[4])
    elif model == "OPENCV":
        out.update(fl_x=p[0], fl_y=p[1], cx=p[2], cy=p[3],
                   k1=p[4], k2=p[5], p1=p[6], p2=p[7])
    else:
        raise ValueError(f"unsupported camera model {model}")
    out["camera_angle_x"] = math.atan(w / (out["fl_x"] * 2)) * 2
    out["camera_angle_y"] = math.atan(h / (out["fl_y"] * 2)) * 2

    img_lines = [l for l in (text / "images.txt").read_text().splitlines()
                 if l and not l.startswith("#")]
    frames = []
    flip_mat = np.diag([1, -1, -1, 1.0])
    for i in range(0, len(img_lines), 2):  # every other line is 2D points
        el = img_lines[i].split()
        qvec = np.array([float(x) for x in el[1:5]])
        tvec = np.array([float(x) for x in el[5:8]])
        name = "_".join(el[9:])
        if i // 2 < args.skip_early:
            continue
        R = qvec2rotmat(qvec)
        t = tvec.reshape(3, 1)
        w2c = np.concatenate([np.concatenate([R, t], 1), [[0, 0, 0, 1]]], 0)
        c2w = np.linalg.inv(w2c)
        if not args.keep_colmap_coords:
            c2w = c2w @ flip_mat               # COLMAP → NeRF camera axes
        ip = Path(args.images) / name
        frames.append({"file_path": str(ip),
                       "sharpness": sharpness(ip) if ip.exists() else 100.0,
                       "transform_matrix": c2w})

    if not args.keep_colmap_coords and frames:
        # reorient up, recenter on ray-crossing centroid, rescale (ref recipe)
        up = np.zeros(3)
        for f in frames:
            up += -np.asarray(f["transform_matrix"])[:3, 1]
        R = rotmat_between(up, np.array([0, 0, 1.0]))
        R4 = np.eye(4)
        R4[:3, :3] = R
        for f in frames:
            f["transform_matrix"] = R4 @ f["transform_matrix"]
        totw, totp = 0.0, np.zeros(3)
        for fa in frames:
            ma = np.asarray(fa["transform_matrix"])
            for fb in frames:
                mb = np.asarray(fb["transform_matrix"])
                pt, wgt = closest_point_2_lines(ma[:3, 3], ma[:3, 2],
                                                mb[:3, 3], mb[:3, 2])
                if wgt > 0.01:
                    totp += pt * wgt
                    totw += wgt
        center = totp / max(totw, 1e-9)
        avglen = 0.0
        for f in frames:
            m = np.asarray(f["transform_matrix"])
            m[:3, 3] -= center
            avglen += np.linalg.norm(m[:3, 3])
            f["transform_matrix"] = m
        avglen /= len(frames)
        for f in frames:
            m = f["transform_matrix"]
            m[:3, 3] *= 4.0 / max(avglen, 1e-9)
            f["transform_matrix"] = m

    out["frames"] = [{**f, "transform_matrix":
                      np.asarray(f["transform_matrix"]).tolist()}
                     for f in frames]
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out} with {len(frames)} frames")


if __name__ == "__main__":
    sys.exit(main())
