"""Cold-compile timing of the north-star dd-Pallas step program.

Points the XLA persistent cache at a throwaway directory so the
measurement is a true cold compile without disturbing the shared cache.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/cold_compile_bench.py [B]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

tmp = tempfile.mkdtemp(prefix="heyoka_cold_cache_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = tmp

import numpy as np

import heyoka_tpu as hy

import jax

jax.config.update("jax_compilation_cache_dir", tmp)

from bench import IC, MASSES, GCONST
from heyoka_tpu.models import nbody

B = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
rng = np.random.default_rng(0)
states = IC[None, :] + np.abs(IC)[None, :] * (
    rng.uniform(-1, 1, (B, IC.size)) * 1e-8
)

use_warmup = "--serial" not in sys.argv

t0 = time.perf_counter()
tb = hy.taylor_adaptive_batch(
    nbody(6, masses=MASSES, Gconst=GCONST), states, tol=1e-15,
    high_accuracy=True, compact_mode="flat", mp_order=8,
    pallas_phase="auto",
)
t_build = time.perf_counter() - t0
t_warm = 0.0
if use_warmup:
    t0 = time.perf_counter()
    tb.warmup()
    t_warm = time.perf_counter() - t0
t0 = time.perf_counter()
tb.step()
t_step = time.perf_counter() - t0
t0 = time.perf_counter()
tb.propagate_until(np.full(B, 0.05))
t_prop = time.perf_counter() - t0
print(json.dumps({
    "bench": "cold_compile",
    "batch": B,
    "pallas_phase": str(tb._pallas_phase),
    "warmup": use_warmup,
    "build_s": round(t_build, 1),
    "warmup_s": round(t_warm, 1),
    "first_step_s": round(t_step, 1),
    "first_propagate_s": round(t_prop, 1),
    "total_cold_s": round(t_build + t_warm + t_step + t_prop, 1),
}))
