#!/usr/bin/env python3
"""Driver benchmark: prints ONE JSON line.

Flagship metric (BASELINE.json): fox NeRF — time to reach 30 dB PSNR on a
held-out training view. Driver target: < 60 s on the chip; vs_baseline is
target_seconds / our_seconds (≥ 1.0 = target met). If 30 dB isn't reached
inside the budget, reports the PSNR actually reached (vs_baseline =
psnr/30).

A cheap TPU reachability probe (tiny matmul in a subprocess, 120 s cap)
runs first so a wedged tunnel produces a result line in seconds instead of
burning the full budget (the round-1 failure mode).
"""
import json
import subprocess
import sys

PROBE_TIMEOUT_S = 600
TIMEOUT_S = 3600
TARGET_DB = 30.0
TARGET_SECONDS = 60.0

PROBE = r"""
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((256, 256))
print("PROBE_OK", jax.devices()[0].platform, float(np.asarray((x @ x))[0, 0]))
"""

CHILD = r"""
import json, os, time
import numpy as np
os.environ["NGP_TPU_GRID_IMPL"] = "blocked"
# persistent XLA compile cache: tunnel compiles can run minutes; the cache
# amortizes them across bench invocations on the same machine
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
from ngp_tpu.common import linear_to_srgb_np
from ngp_tpu.config import load_network_config
from ngp_tpu.data.nerf_loader import load_nerf
from ngp_tpu.opt.optimizers import inference_params
from ngp_tpu.render.nerf_render import NerfRenderer, RenderOptions
from ngp_tpu.train.nerf import NerfTrainer, NerfTrainerConfig

# upstream instant-ngp world mapping — REQUIRED for the classic fox capture
ds = load_nerf("/root/reference/data/nerf/fox", scale=0.33,
               offset=[0.5, 0.5, 0.5])
cfg = load_network_config("configs/nerf/base.json")
# pinned ray count: every distinct n_rays is a fresh XLA compile (minutes
# through the tunnel). Fox rays average ~200 kept samples (aabb 4), so
# the 2^18 sample budget supports ~1300 full rays; 1024 keeps the
# segment compaction fully under capacity (8192 dropped ~85%% of rays
# per step and paid 8x the march cost).
tr = NerfTrainer(ds, cfg, tcfg=NerfTrainerConfig(n_rays=1024,
                                                 adapt_rays=False))

view, scale = 0, 4
W = int(ds.resolution[view][0]) // scale
H = int(ds.resolution[view][1]) // scale
gt = ds.images[view].astype(np.float32)
yi = np.minimum(np.arange(H) * gt.shape[0] // H + gt.shape[0] // (2 * H),
                gt.shape[0] - 1)
xi = np.minimum(np.arange(W) * gt.shape[1] // W + gt.shape[1] // (2 * W),
                gt.shape[1] - 1)
gt = gt[yi][:, xi]
gt_srgb = linear_to_srgb_np(np.clip(gt[..., :3], 0, 1))
renderer = NerfRenderer.for_trainer(tr, RenderOptions(
    width=W, height=H, background=(0, 0, 0, 0), linear_out=True,
    chunk=1 << 15,
    # dataset intrinsics: off-center principal + OpenCV distortion —
    # rendering with defaults warps the frame vs GT (~8 dB on fox)
    principal=tuple(float(x) for x in ds.principal[view]),
    lens_params=tuple(float(x) for x in ds.lens_params[view][:4]),
    lens_mode="opencv" if ds.lens_is_opencv else "auto"))
focal = (float(ds.focal[view][0]) / scale, float(ds.focal[view][1]) / scale)

def eval_psnr():
    p = inference_params(tr.params, tr.opt_state, tr.opt_cfg)
    img = renderer.render(p, tr.grid.bitfield, ds.xforms[view], W, H,
                          focal=focal)
    pred = linear_to_srgb_np(np.clip(img[..., :3], 0, 1))
    mse = float(np.mean((pred - gt_srgb) ** 2))
    return -10 * np.log10(max(mse, 1e-10))

tr.train(16)          # compile train path outside the timed region
eval_psnr()           # compile render path

train_s = 0.0
elapsed = None
psnr = 0.0
for chunk in [64, 112, 128, 192, 256, 256, 512, 512, 1024,
              1024, 1024, 1024]:
    t0 = time.time()
    tr.train(chunk)
    train_s += time.time() - t0
    psnr = eval_psnr()
    print("steps=%%d train_s=%%.1f psnr=%%.2f" %% (tr.training_step, train_s,
                                                   psnr), flush=True)
    if psnr >= %(target)f:
        elapsed = train_s
        break
    if train_s > 1500:
        break

if elapsed is None:
    print("RESULT " + json.dumps({
        "metric": "fox NeRF: PSNR after %%.0fs training" %% train_s,
        "value": round(psnr, 2), "unit": "dB",
        "vs_baseline": round(psnr / %(target)f, 3)}))
else:
    print("RESULT " + json.dumps({
        "metric": "fox NeRF: train time to %(target).0f dB PSNR",
        "value": round(elapsed, 2), "unit": "s",
        "vs_baseline": round(%(ref)f / elapsed, 4)}))
""" % {"target": TARGET_DB, "ref": TARGET_SECONDS}


def main():
    try:
        probe = subprocess.run([sys.executable, "-u", "-c", PROBE],
                               capture_output=True, text=True,
                               timeout=PROBE_TIMEOUT_S, cwd="/root/repo")
        if "PROBE_OK" not in probe.stdout:
            print(json.dumps({
                "metric": "bench skipped (accelerator probe failed)",
                "value": 0, "unit": "", "vs_baseline": 0}))
            sys.stderr.write(probe.stdout[-500:] + probe.stderr[-1000:])
            return 0
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "bench skipped (TPU tunnel unresponsive in probe)",
            "value": 0, "unit": "", "vs_baseline": 0}))
        return 0

    try:
        out = subprocess.run([sys.executable, "-u", "-c", CHILD],
                             capture_output=True, text=True,
                             timeout=TIMEOUT_S, cwd="/root/repo")
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):])
                return 0
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
        print(json.dumps({"metric": "bench failed (no result line)",
                          "value": 0, "unit": "", "vs_baseline": 0}))
    except subprocess.TimeoutExpired as e:
        # salvage the last PSNR the child reported before the cap
        partial = (e.stdout or b"")
        if isinstance(partial, bytes):
            partial = partial.decode(errors="replace")
        psnr = 0.0
        for line in partial.splitlines():
            if "psnr=" in line:
                try:
                    psnr = float(line.rsplit("psnr=", 1)[1].split()[0])
                except ValueError:
                    pass
        print(json.dumps({
            "metric": "fox NeRF: best PSNR before bench timeout",
            "value": round(psnr, 2), "unit": "dB",
            "vs_baseline": round(psnr / TARGET_DB, 3)}))
        sys.stderr.write(partial[-1500:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
