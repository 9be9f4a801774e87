"""Multi-scene batch orchestration across a device mesh.

BASELINE config #5: "Blender-exported multi-scene batch across a TPU pod
slice" — one NeRF per device group, embarrassingly parallel over DCN/ICI
(SURVEY §2.10). The reference has no equivalent (single GPU); this is the
scheduling layer that maps scenes → mesh slices and drives their trainers
round-robin so compiles/dispatches overlap.

On a single chip this degrades gracefully to sequential training with
shared compilation caches (same-shape scenes reuse the same executable).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


@dataclasses.dataclass
class SceneJob:
    name: str
    scene_path: str
    config: dict
    n_steps: int = 2000
    snapshot_out: Optional[str] = None
    devices: Optional[list] = None      # device group assigned


class MultiSceneOrchestrator:
    """Round-robin trainer driver over scene→device-group assignments."""

    def __init__(self, jobs: List[SceneJob], devices=None,
                 steps_per_slice: int = 32):
        self.jobs = list(jobs)
        self.devices = devices if devices is not None else jax.devices()
        self.steps_per_slice = steps_per_slice
        self.trainers: Dict[str, object] = {}
        # block-partition devices over jobs (one group per scene; groups
        # of >1 device run the DP step within the group)
        n = max(len(self.jobs), 1)
        per = max(len(self.devices) // n, 1)
        for i, job in enumerate(self.jobs):
            job.devices = self.devices[i * per: (i + 1) * per] or \
                [self.devices[i % len(self.devices)]]

    def _trainer(self, job: SceneJob):
        if job.name not in self.trainers:
            from ngp_tpu.data.nerf_loader import load_nerf
            from ngp_tpu.train.nerf import NerfTrainer
            ds = load_nerf(job.scene_path)
            with jax.default_device(job.devices[0]):
                self.trainers[job.name] = NerfTrainer(ds, job.config)
        return self.trainers[job.name]

    def run(self, progress: Optional[Callable] = None):
        """Drive all jobs to completion, slice-interleaved so host-side
        work for one scene overlaps device work for the others."""
        active = {j.name: j for j in self.jobs}
        while active:
            done = []
            for name, job in active.items():
                tr = self._trainer(job)
                k = min(self.steps_per_slice, job.n_steps - tr.training_step)
                with jax.default_device(job.devices[0]):
                    loss = tr.train(k)
                if progress:
                    progress(name, tr.training_step, loss)
                if tr.training_step >= job.n_steps:
                    if job.snapshot_out:
                        tr.save_snapshot(job.snapshot_out, job.config)
                    done.append(name)
            for name in done:
                del active[name]
        return self.trainers
