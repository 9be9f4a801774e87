#!/usr/bin/env python3
"""Driver benchmark: prints ONE JSON line.

Flagship benchmark: neural-image fit on the bundled albert.exr (BASELINE
config #1) — time to reach 30 dB PSNR. The reference ("instant" NGP on an
RTX 3090) converges this in roughly 2 s; vs_baseline is
baseline_seconds / our_seconds (1.0 = parity).

The measurement runs in a subprocess with a hard timeout so a wedged TPU
tunnel still produces a result line.
"""
import json
import subprocess
import sys

TIMEOUT_S = 1500
REFERENCE_SECONDS = 2.0
TARGET_DB = 30.0

CHILD = r"""
import json, os, time
import numpy as np
from ngp_tpu.config import load_network_config
from ngp_tpu.data.image_io import load_exr
from ngp_tpu.train.image import ImageTrainer

img = load_exr("/root/reference/data/image/albert.exr")
cfg = load_network_config("configs/image/base.json")

def build(impl):
    os.environ["NGP_TPU_GRID_IMPL"] = impl
    t = ImageTrainer(img, cfg, batch_size=1 << 18)
    t.train(1)  # compile outside the timed region
    return t

try:
    tr = build("blocked")   # Pallas kernel path
except Exception as e:
    import sys
    print("blocked-grid path failed (%%s); falling back to tcnn-gather"
          %% e, file=sys.stderr)
    tr = build("tcnn")

t0 = time.time()
elapsed = None
psnr = 0.0
for chunk in [10, 20, 30, 60, 120, 240, 480]:
    tr.train(chunk)
    t_now = time.time() - t0
    psnr = tr.psnr()
    if psnr >= %(target)f:
        elapsed = t_now
        break
    if t_now > 900:
        break

if elapsed is None:
    print("RESULT " + json.dumps({
        "metric": "albert.exr image fit: PSNR after %%.0fs" %% (time.time() - t0),
        "value": round(psnr, 2), "unit": "dB",
        "vs_baseline": round(psnr / %(target)f, 3)}))
else:
    print("RESULT " + json.dumps({
        "metric": "albert.exr image fit: time to 30 dB PSNR",
        "value": round(elapsed, 2), "unit": "s",
        "vs_baseline": round(%(ref)f / elapsed, 4)}))
""" % {"target": TARGET_DB, "ref": REFERENCE_SECONDS}


def main():
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
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "bench timed out (TPU tunnel unresponsive)",
            "value": 0, "unit": "", "vs_baseline": 0}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
