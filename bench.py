#!/usr/bin/env python3
"""Driver benchmark: prints ONE JSON line.

Current flagship benchmark: neural-image fit quality/time on the bundled
albert.exr (BASELINE config #1) — time to reach 30 dB PSNR. The reference
("instant" NGP on RTX 3090) converges this in roughly 2 s; vs_baseline is
baseline_seconds / our_seconds (1.0 = parity, >1 = faster than reference).

This will switch to the fox-NeRF time-to-30dB metric (BASELINE.json north
star) once the NeRF training stack is the flagship path.
"""
import json
import sys
import time


REFERENCE_SECONDS = 2.0  # RTX 3090 "converges in seconds" (BASELINE.md)
TARGET_DB = 30.0


def main():
    import numpy as np
    from ngp_tpu.config import load_network_config
    from ngp_tpu.data.image_io import load_exr
    from ngp_tpu.train.image import ImageTrainer

    img = load_exr("/root/reference/data/image/albert.exr")
    cfg = load_network_config("configs/image/base.json")
    tr = ImageTrainer(img, cfg, batch_size=1 << 18)
    tr.train(1)  # compile outside the timed region

    t0 = time.time()
    elapsed = None
    steps = 0
    for chunk in [10, 20, 30, 60, 120, 240, 480]:
        tr.train(chunk)
        steps += chunk
        t_now = time.time() - t0
        psnr = tr.psnr()
        if psnr >= TARGET_DB:
            elapsed = t_now
            break
        if t_now > 600:
            break

    if elapsed is None:
        print(json.dumps({
            "metric": "albert.exr image fit: PSNR after %.0fs" % (time.time() - t0),
            "value": round(psnr, 2), "unit": "dB",
            "vs_baseline": round(psnr / TARGET_DB, 3),
        }))
    else:
        print(json.dumps({
            "metric": "albert.exr image fit: time to 30 dB PSNR",
            "value": round(elapsed, 2), "unit": "s",
            "vs_baseline": round(REFERENCE_SECONDS / elapsed, 4),
        }))


if __name__ == "__main__":
    sys.exit(main())
