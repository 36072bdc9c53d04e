#!/usr/bin/env python
"""Per-op device profile of the staged step: capture a jax profiler trace
and dump the op-level time table (tensorboard_plugin_profile converter)."""
import glob
import gzip
import json
import math
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import heyoka_tpu as hy
    hy.s11n.enable_compilation_cache()
    from bench import IC, MASSES, GCONST
    from heyoka_tpu.models import nbody
    from heyoka_tpu.expr.decompose import taylor_decompose_sys
    from heyoka_tpu.taylor.compact_flat import make_batched_step_flat
    from heyoka_tpu.taylor.stepper import taylor_order_from_tol

    BATCH = 10_240
    dtype = jnp.float64
    tape = taylor_decompose_sys(nbody(6, masses=MASSES, Gconst=GCONST))
    order = taylor_order_from_tol(1e-15)
    rng = np.random.default_rng(0)
    states = jnp.asarray(
        IC[None, :] + np.abs(IC)[None, :]
        * (rng.uniform(-1, 1, (BATCH, IC.size)) * 1e-8), dtype)
    pars = jnp.zeros((BATCH, 0), dtype)
    t0 = jnp.zeros((BATCH,), dtype)
    mdt = jnp.full((BATCH,), math.inf, dtype)

    step = jax.jit(make_batched_step_flat(
        tape, order, dtype=dtype, high_accuracy=True, mp_order=8,
        layout="3d", unroll=True, staged=True))
    s, h = step(states, pars, t0, mdt)
    float(h[0])

    jax.profiler.start_trace("/tmp/prof")
    t = t0
    for _ in range(4):
        s, h = step(s, pars, t, mdt)
        t = t + h
    float(t[0])
    jax.profiler.stop_trace()

    xs = sorted(glob.glob("/tmp/prof/**/*.xplane.pb", recursive=True))
    print("xplanes:", xs, flush=True)
    if not xs:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rd
    for tool in ["op_profile", "tensorflow_stats"]:
        try:
            data = rd.xspace_to_tool_data([xs[-1]], tool, {})
            out = data[0] if isinstance(data, tuple) else data
            fn = f"/tmp/prof/{tool}.out"
            mode = "wb" if isinstance(out, bytes) else "w"
            with open(fn, mode) as f:
                f.write(out)
            print("wrote", fn, flush=True)
        except Exception as e:
            print(tool, "failed:", type(e).__name__, e, flush=True)


if __name__ == "__main__":
    main()
