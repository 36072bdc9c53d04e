"""The TPU fast path: compact_mode="flat" batch integration.

The staged flat engine (see PERF.md) is the production configuration for
large trajectory batches on TPU: a natively-batched adaptive step with a
3-D coefficient layout, unrolled exact-window convolutions and staged
operand buffers, plus on-device lockstep propagate_until / propagate_grid
drivers.  At the north-star workload (outer-Solar-System 6-body, 10240
trajectories, tol=1e-15, high accuracy) it reaches ~288k f64-parity
steps/s/chip on a TPU v5e — ~6x the loop engine through the same API.

``mp_order=10`` additionally computes Taylor orders > 10 in float32 — a
TPU-native extension that leaves the 100-year energy drift of the 6-body
problem unchanged (~1.3e-13) while skipping most of the emulated-f64 work.

Run:  python examples/11_fast_batch_tpu.py
"""

import numpy as np

import heyoka_tpu as hy

# reuse compiled steps across runs (heyoka's JIT-cache analog)
hy.s11n.enable_compilation_cache()

# outer Solar System (Sun + 4 giants + Pluto), AU / years
MASSES = [1.00000597682, 1.0 / 1047.355, 1.0 / 3501.6,
          1.0 / 22869.0, 1.0 / 19314.0, 7.4074074e-09]
G = 0.01720209895 ** 2 * 365 * 365
sys_ = hy.models.nbody(6, masses=MASSES, Gconst=G)

# a cloud of perturbed initial conditions (keep B modest for the example;
# the engine is fastest at B ~ 10k-20k on a v5e chip)
import pathlib  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from bench import IC  # noqa: E402  (the benchmark's J2000-ish state)

B = 256
rng = np.random.default_rng(0)
states = IC[None, :] + np.abs(IC)[None, :] * rng.uniform(-1, 1, (B, 36)) * 1e-8

ta = hy.taylor_adaptive_batch(
    sys_, states, tol=1e-15, high_accuracy=True,
    compact_mode="flat",      # the staged flat engine
    mp_order=8,               # f32 above order 8 (drift-neutral here)
    pallas_phase="auto",      # on TPU: the whole jet in one VMEM-resident
                              # Pallas kernel, low orders in double-float
                              # (two-f32 error-free transforms) — 2.1M
                              # steps/s at B=10240 on v5e; off-TPU this
                              # resolves to the staged XLA engine
)

# lockstep on-device propagation: one compiled while_loop for all lanes
outcomes, min_h, max_h, nsteps = ta.propagate_until(100.0)
print("propagated", B, "trajectories 100 yr in", int(nsteps.sum()), "lane-steps")
print("mean step:", float(100.0 / np.mean(nsteps)), "yr")

# dense sampling over a shared grid rides the same engine
grid = np.linspace(100.0, 110.0, 11)
outcomes, *_, out = ta.propagate_grid(grid)
print("grid sample shape:", out.shape)  # (B, len(grid), 36)

# energy drift check (f64-parity accuracy); the cfunc inputs must follow
# the integrator's state order, i.e. the system's lhs order
from heyoka_tpu.models import nbody_energy  # noqa: E402

state_vars = [lhs for lhs, _rhs in sys_]
en = hy.make_cfunc([nbody_energy(6, masses=MASSES, Gconst=G)], vars=state_vars)
e0 = en(states[0])[0]
e1 = en(ta.state[0])[0]
print("relative energy drift over 110 yr: %.2e" % abs((e1 - e0) / e0))
