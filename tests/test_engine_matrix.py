"""Engine x dtype per-op jet matrix (VERDICT r1 #7).

Reference analog: the fp_types x opt-level x compact sweeps of
test/taylor_sincos.cpp:40,351 — every op family's Taylor recurrence is
checked on EVERY jet engine that supports it, at f64 and f32.

To bound compile count, all op cases are fused into ONE combined ODE
system per engine (each case gets its own state variable), so the whole
matrix costs one jit per engine x dtype instead of ops x engines.
"""

import numpy as np
import jax.numpy as jnp
import pytest

#: compile-heavy module: slow tier (see tests/conftest.py)
pytestmark = pytest.mark.slow

import heyoka_tpu as hy
from heyoka_tpu.expr.decompose import taylor_decompose_sys

from oracle import taylor_coeffs_oracle

ORDER = 7

# (builder(x) -> rhs, x0)
CASES1 = [
    (lambda x: hy.sin(x), 0.7),
    (lambda x: hy.cos(x), 0.7),
    (lambda x: hy.tan(x), 0.4),
    (lambda x: hy.exp(-x), 0.5),
    (lambda x: hy.log(x), 1.7),
    (lambda x: hy.sqrt(x), 2.3),
    (lambda x: x ** (-1.5), 1.9),
    (lambda x: x**3, 0.8),
    (lambda x: hy.sinh(x), 0.4),
    (lambda x: hy.cosh(x), 0.4),
    (lambda x: hy.tanh(x), 0.4),
    (lambda x: hy.asin(x), 0.3),
    (lambda x: hy.acos(x), 0.3),
    (lambda x: hy.atan(x), 0.6),
    (lambda x: hy.asinh(x), 0.6),
    (lambda x: hy.acosh(x + 2.0), 0.5),
    (lambda x: hy.atanh(x), 0.4),
    (lambda x: hy.erf(x), 0.3),
    (lambda x: hy.sigmoid(x), 0.2),
    (lambda x: 1.0 / x, 1.4),
    (lambda x: hy.kepE(0.25, x), 0.7),
    (lambda x: hy.time * x, 0.9),
]

# (builder(x, y) -> (rhs_x, rhs_y), [x0, y0])
CASES2 = [
    (lambda x, y: (y, -9.8 * hy.sin(x)), [0.05, 0.025]),
    (lambda x, y: (x * y, x - y), [0.7, 0.4]),
    (lambda x, y: (x / y, y / (x + y)), [0.7, 1.4]),
    (lambda x, y: (hy.atan2(y, x), hy.atan2(x, y)), [0.8, 0.6]),
]


def _build_sys(skip=()):
    sys_, state0, case_ids = [], [], []
    for i, (f, s0) in enumerate(CASES1):
        cid = f"c1_{i}"
        if cid in skip:
            continue
        v = hy.make_vars(f"u{i}")
        sys_.append((v, f(v)))
        state0.append(s0)
        case_ids.append(cid)
    for i, (f, s0) in enumerate(CASES2):
        cid = f"c2_{i}"
        if cid in skip:
            continue
        a, b = hy.make_vars(f"a{i}", f"b{i}")
        fx, fy = f(a, b)
        sys_ += [(a, fx), (b, fy)]
        state0 += list(s0)
        case_ids.append(cid)
    return sys_, state0, case_ids


def _jet_tc(engine, tape, state0, dt):
    """Return tc (ORDER+1, n_eq) through the requested engine."""
    n = len(state0)
    st = jnp.asarray(state0, dt)
    p = jnp.zeros((tape.n_pars,), dt)
    t0 = jnp.asarray(0.0, dt)
    if engine == "unrolled":
        from heyoka_tpu.taylor.jet import make_jet_fn

        return np.asarray(make_jet_fn(tape, ORDER, dtype=dt)(st, p, t0))[:, :n]
    if engine == "compact":
        from heyoka_tpu.taylor.compact import make_jet_fn_compact

        return np.asarray(
            make_jet_fn_compact(tape, ORDER, dtype=dt)(st, p, t0)
        )[:, :n]
    if engine == "compact_loop":
        from heyoka_tpu.taylor.compact_loop import make_jet_fn_compact_loop

        return np.asarray(
            make_jet_fn_compact_loop(tape, ORDER, dtype=dt)(st, p, t0)
        )[:, :n]
    if engine in ("flat", "flat_staged", "pallas_dd"):
        from heyoka_tpu.taylor.compact_flat import make_batched_step_flat

        kw = dict(dtype=dt, return_tc=True)
        if engine == "flat_staged":
            kw.update(layout="3d", unroll=True, staged=True)
        if engine == "pallas_dd":
            kw.update(layout="3d", unroll=True, staged=True,
                      mp_order=ORDER, pallas_phase="dd-interpret")
        step = make_batched_step_flat(tape, ORDER, **kw)
        _res, _h, tc = step(
            st[None, :], p[None, :], t0[None],
            jnp.full((1,), 1e-6, dt),
        )
        return np.asarray(tc[0])[:, :n]
    if engine == "native":
        from heyoka_tpu.native import native_jet

        return np.asarray(
            native_jet(tape, np.asarray(state0, np.float64),
                       np.zeros((tape.n_pars,)), 0.0, ORDER)
        )[:, :n]
    raise ValueError(engine)


def _probe_skip(engine, dt):
    """Case ids the engine cannot build (raises at construction)."""
    skip = set()
    for i, (f, s0) in enumerate(CASES1):
        v = hy.make_vars("pv")
        try:
            _jet_probe(engine, [(v, f(v))], dt)
        except Exception:
            skip.add(f"c1_{i}")
    for i, (f, s0) in enumerate(CASES2):
        a, b = hy.make_vars("pa", "pb")
        fx, fy = f(a, b)
        try:
            _jet_probe(engine, [(a, fx), (b, fy)], dt)
        except Exception:
            skip.add(f"c2_{i}")
    return skip


def _jet_probe(engine, sys_, dt):
    """Build (not run) the engine for a tape — raises if unsupported."""
    tape = taylor_decompose_sys(sys_)
    if engine == "compact_loop":
        from heyoka_tpu.taylor.compact_loop import make_jet_fn_compact_loop

        make_jet_fn_compact_loop(tape, ORDER, dtype=dt)
    elif engine in ("flat", "flat_staged", "pallas_dd"):
        from heyoka_tpu.taylor.compact_flat import make_batched_step_flat

        kw = dict(dtype=dt, return_tc=True)
        if engine != "flat":
            kw.update(layout="3d", unroll=True, staged=True)
        if engine == "pallas_dd":
            kw.update(mp_order=ORDER, pallas_phase="dd-interpret")
        make_batched_step_flat(tape, ORDER, **kw)
    elif engine == "native":
        from heyoka_tpu.native import pack_tape

        pack_tape(tape)


ENGINES_F64 = ["unrolled", "compact", "compact_loop", "flat", "flat_staged",
               "pallas_dd", "native"]
ENGINES_F32 = ["unrolled", "compact", "compact_loop", "flat", "flat_staged"]

#: per-engine comparison tolerance vs the f64 symbolic oracle
RTOL = {
    "f64": 1e-11,
    "f32": 3e-3,
    "pallas_dd": 5e-9,  # two-f32 double-float floor after 7 orders
}


def _run_matrix(engine, dt_name):
    dt = jnp.float64 if dt_name == "f64" else jnp.float32
    if engine == "native":
        from heyoka_tpu.native import native_available

        if not native_available():
            pytest.skip("native library not built")
    skip = _probe_skip(engine, dt)
    if engine == "pallas_dd":
        # in the combined system the pow ops of different cases land in
        # one group; the dd kernel rejects mixed exponents per group, so
        # keep a single pow case (x**3) in this engine's matrix
        skip = skip | {"c1_6"}
    sys_, state0, case_ids = _build_sys(skip)
    assert len(case_ids) >= 20, (
        f"engine {engine} supports too few op cases: {sorted(case_ids)}"
    )
    tape = taylor_decompose_sys(sys_)
    tc = _jet_tc(engine, tape, state0, dt)
    want = taylor_coeffs_oracle(sys_, state0, ORDER)
    rtol = RTOL["pallas_dd"] if engine == "pallas_dd" else RTOL[dt_name]
    np.testing.assert_allclose(
        tc, want, rtol=rtol, atol=rtol,
        err_msg=f"{engine}/{dt_name}; cases {case_ids}",
    )


@pytest.mark.parametrize("engine", ENGINES_F64)
def test_engine_matrix_f64(engine):
    _run_matrix(engine, "f64")


@pytest.mark.parametrize("engine", ENGINES_F32)
def test_engine_matrix_f32(engine):
    _run_matrix(engine, "f32")
