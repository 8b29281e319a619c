"""Isolate the cbox-improved TPU crash: ablate the improved-config axes
(sppPerPass=1, loss=kl, spatialFilter=stochastic, inversevar) one at a
time at a small budget and find which one kills the TPU worker."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ppg_tpu.integrators.guided import GuidedPathTracer
from ppg_tpu.scene.scene import load_scene

CASES = [
    ("baseline-cbox-defaults", {}),
    ("spp1", dict(sppPerPass=1)),
    ("kl", dict(bsdfSamplingFractionLoss="kl")),
    ("stochastic", dict(spatialFilter="stochastic")),
    ("inversevar", dict(sampleCombination="inversevar")),
    ("improved-all", dict(sppPerPass=1, bsdfSamplingFractionLoss="kl",
                          spatialFilter="stochastic",
                          sampleCombination="inversevar",
                          sTreeThreshold=4000)),
]

budget = int(sys.argv[1]) if len(sys.argv) > 1 else 16
only = sys.argv[2] if len(sys.argv) > 2 else None

for name, over in CASES:
    if only and name != only:
        continue
    sc = load_scene("/root/reference/scenes/cbox/cbox.xml")
    sc.integrator["budgetType"] = "spp"
    sc.integrator["budget"] = budget
    for k, v in over.items():
        sc.integrator[k] = v
    t0 = time.time()
    try:
        img = np.asarray(GuidedPathTracer(sc).render(seed=0,
                                                     spp_budget=budget))
        print(f"[{name}] OK {time.time()-t0:.1f}s mean="
              f"{img.mean((0, 1)).round(4)}", flush=True)
    except Exception as e:
        print(f"[{name}] FAILED {time.time()-t0:.1f}s: {type(e).__name__} "
              f"{str(e)[:200]}", flush=True)
        break
