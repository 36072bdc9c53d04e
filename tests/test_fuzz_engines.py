"""Engine fuzzing against the native (C++ tape interpreter) oracle
(VERDICT r3 item 10).

Random ODE systems from the gp expression generator are decomposed and
their Taylor jets computed by the production engines (staged flat,
mixed-precision flat, compact_loop) at orders 7 and 20, then compared
coefficient-by-coefficient against ``native_jet`` — an independent
opcode-switch C++ implementation of the same recurrences
(`_native/taperun.cpp`).  This is the breadth axis of the reference's
80k-LoC test suite (e.g. ``test/taylor_op.cpp``'s per-op sweeps times
random compositions) that hand-enumerated cases can't cover.

Systems whose jets leave the comparable range (non-finite, |c| > 1e6
from exp towers, etc.) are regenerated — the property under test is
agreement on well-scaled jets, not saturation behaviour.

``HEYOKA_FUZZ_N`` scales the sweep (default 60 systems per run; the
recorded 500-system sweep is in PERF.md).  Engines run EAGERLY (no jit)
so per-system cost is dispatch, not XLA compilation.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import heyoka_tpu as hy
from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.gp import ExpressionGenerator
from heyoka_tpu.native import native_available, native_jet
from heyoka_tpu.taylor.compact_flat import make_batched_step_flat
from heyoka_tpu.taylor.compact_loop import make_jet_fn_compact_loop

N_SYS = int(os.environ.get("HEYOKA_FUZZ_N", "60"))
MP = 8

#: compile-heavy module: slow tier (see tests/conftest.py)
pytestmark = [
    pytest.mark.skipif(
        not native_available(), reason="native backend unavailable"
    ),
    pytest.mark.slow,
]


def _gen_system(rng):
    """One random 2-equation ODE system and an interior state."""
    g = ExpressionGenerator(["x", "y"], rng=rng)
    # no pow (x**y decomposes through log: domain minefield for a
    # random state); log stays, guarded by the finite/range filter
    g.b_funcs = []
    g.weights = [1.0, 2.0, 2.0, 1.0, 0.0]
    g.range_dbl = 2.0
    x, y = hy.make_vars("x", "y")
    lo, hi = int(rng.integers(1, 3)), int(rng.integers(2, 4))
    sys_ = [(x, g(lo, hi)), (y, g(lo, hi))]
    state0 = rng.uniform(0.35, 1.2, 2)
    return sys_, state0


def _engine_tc(engine, tape, state0, order):
    dt = jnp.float64
    n = len(state0)
    if engine == "compact_loop":
        return np.asarray(
            make_jet_fn_compact_loop(tape, order, dtype=dt)(
                jnp.asarray(state0, dt), jnp.zeros((tape.n_pars,), dt),
                jnp.asarray(0.0, dt),
            )
        )[:, :n]
    kw = dict(dtype=dt, return_tc=True, layout="3d", unroll=True,
              staged=True)
    if engine == "flat_mixed":
        kw.update(mp_order=min(MP, order - 1))
    step = make_batched_step_flat(tape, order, **kw)
    st = jnp.asarray(state0, dt)[None, :]
    p = jnp.zeros((1, tape.n_pars), dt)
    t0 = jnp.zeros((1,), dt)
    mdt = jnp.full((1,), 1e-6, dt)
    _res, _h, tc = step(st, p, t0, mdt)
    return np.asarray(tc[0])[:, :n]


def _usable(jet):
    m = np.abs(jet)
    return bool(np.isfinite(jet).all() and m.max() < 1e6)


@pytest.mark.parametrize("order", [7, 20])
def test_fuzz_engines_vs_native(order):
    rng = np.random.default_rng(20260820 + order)
    checked = 0
    attempts = 0
    while checked < N_SYS:
        attempts += 1
        assert attempts < 40 * N_SYS, "generator keeps hitting domains"
        sys_, state0 = _gen_system(rng)
        try:
            tape = taylor_decompose_sys(sys_)
        except Exception:
            continue  # unsupported op composition
        try:
            ref_full = native_jet(tape, state0, None, 0.0, order)
        except Exception:
            continue
        ref = ref_full[:, :2]
        if not _usable(ref_full):
            continue
        for engine in ("flat_staged", "flat_mixed", "compact_loop"):
            try:
                tc = _engine_tc(engine, tape, state0, order)
            except NotImplementedError:
                continue  # engine lacks a rule for some op: capability
            assert np.isfinite(tc).all(), (engine, checked, sys_)
            for k in range(order + 1):
                # noise floor scales with the largest same-order TAPE
                # value (intermediate u-vars included): a state
                # coefficient is assembled from intermediate
                # convolutions whose operands can dwarf it (e.g. a
                # division chain like x/(x/y))
                scale = max(float(np.abs(ref_full[k]).max()), 1.0)
                if engine == "flat_mixed" and k > min(MP, order - 1):
                    # f32 phase above the dd boundary (scaled carry);
                    # convolution noise grows ~linearly with the term
                    # count at order k
                    tol = 1e-6 * (k + 1) * scale
                else:
                    tol = 5e-12 * scale
                d = float(np.abs(tc[k] - ref[k]).max())
                assert d < tol, (engine, checked, k, d, tol, sys_)
        checked += 1


def test_fuzz_batch_matches_scalar_lane():
    # lockstep batching must not change per-lane arithmetic: a batch of
    # identical lanes reproduces the single-lane jet bit-for-bit
    rng = np.random.default_rng(7)
    done = 0
    attempts = 0
    while done < max(10, N_SYS // 6):
        attempts += 1
        assert attempts < 400
        sys_, state0 = _gen_system(rng)
        try:
            tape = taylor_decompose_sys(sys_)
            ref = native_jet(tape, state0, None, 0.0, 9)[:, :2]
        except Exception:
            continue
        if not _usable(ref):
            continue
        dt = jnp.float64
        step = make_batched_step_flat(tape, 9, dtype=dt, return_tc=True,
                                      layout="3d", unroll=True,
                                      staged=True)
        p1 = jnp.zeros((1, tape.n_pars), dt)
        p4 = jnp.zeros((4, tape.n_pars), dt)
        mdt1 = jnp.full((1,), 1e-6, dt)
        mdt4 = jnp.full((4,), 1e-6, dt)
        st1 = jnp.asarray(state0, dt)[None, :]
        st4 = jnp.tile(st1, (4, 1))
        _, _, tc1 = step(st1, p1, jnp.zeros((1,), dt), mdt1)
        _, _, tc4 = step(st4, p4, jnp.zeros((4,), dt), mdt4)
        np.testing.assert_array_equal(np.asarray(tc4[2]),
                                      np.asarray(tc1[0]))
        done += 1
