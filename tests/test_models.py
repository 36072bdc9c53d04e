"""Model-library tests (reference analogs: test/model_*.cpp, two_body.cpp,
outer_ss.cpp energy conservation)."""

import math

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import models


def test_pendulum_model():
    sys = models.pendulum(gconst=2.0, length=4.0)
    assert len(sys) == 2
    ta = hy.taylor_adaptive(sys, [0.1, 0.0], tol=1e-12)
    ta.propagate_until(1.0)
    # small oscillations: omega^2 = g/l = 0.5
    om = math.sqrt(0.5)
    assert ta.state[0] == pytest.approx(0.1 * math.cos(om * 1.0), abs=2e-4)


def test_two_body_energy_and_period():
    sys = models.nbody(2, masses=[1.0, 1.0])
    # state order: per body [x,y,z,vx,vy,vz]
    # circular orbit of separation d=1: mu = G(m1+m2) = 2, each body radius
    # 0.5, relative orbit radius 1 -> v_rel = sqrt(mu/d) = sqrt(2), each body
    # v = sqrt(2)/2
    vr = math.sqrt(2.0) / 2.0
    state = np.array([-0.5, 0, 0, 0, -vr, 0, 0.5, 0, 0, 0, vr, 0])
    ta = hy.taylor_adaptive(sys, state, tol=1e-15)
    en = hy.make_cfunc(
        [models.nbody_energy(2, masses=[1.0, 1.0])],
        vars=hy.get_variables(models.nbody_energy(2, masses=[1.0, 1.0])),
    )
    # energy cfunc var order is sorted names; build matching input
    def energy(ta_state):
        names = en.tape.var_names
        m = dict(zip(
            ["x_0", "y_0", "z_0", "vx_0", "vy_0", "vz_0",
             "x_1", "y_1", "z_1", "vx_1", "vy_1", "vz_1"],
            ta_state,
        ))
        return float(np.asarray(en(np.array([m[n] for n in names])))[0])

    e0 = energy(ta.state)
    # period of relative orbit: T = 2*pi*sqrt(d^3/mu) = 2*pi/sqrt(2)
    T = 2 * math.pi / math.sqrt(2.0)
    ta.propagate_until(10 * T)
    e1 = energy(ta.state)
    assert abs((e1 - e0) / e0) < 1e-13
    np.testing.assert_allclose(ta.state, state, atol=1e-8)


def test_np1body_matches_nbody():
    # heliocentric formulation vs full nbody, sun + 2 planets
    masses = [1.0, 1e-3, 2e-3]
    G = 1.0
    r1 = np.array([1.0, 0.0, 0.0])
    v1 = np.array([0.0, 1.0, 0.1])
    r2 = np.array([0.0, 1.5, 0.0])
    v2 = np.array([-0.8, 0.0, 0.0])

    sys_h = models.np1body(2, Gconst=G, masses=masses)
    state_h = np.concatenate([r1, v1, r2, v2])
    ta_h = hy.taylor_adaptive(sys_h, state_h, tol=1e-11)
    ta_h.propagate_until(3.0)

    # full nbody in barycentric-ish frame: body0 at origin at rest
    sys_f = models.nbody(3, Gconst=G, masses=masses)
    state_f = np.concatenate(
        [np.zeros(6), np.concatenate([r1, v1]), np.concatenate([r2, v2])]
    )
    ta_f = hy.taylor_adaptive(sys_f, state_f, tol=1e-11)
    ta_f.propagate_until(3.0)
    s = ta_f.state
    rel1 = s[6:9] - s[0:3]
    relv1 = s[9:12] - s[3:6]
    rel2 = s[12:15] - s[0:3]
    relv2 = s[15:18] - s[3:6]
    np.testing.assert_allclose(
        ta_h.state, np.concatenate([rel1, relv1, rel2, relv2]), atol=1e-8
    )


def test_cr3bp_jacobi_conservation():
    sys = models.cr3bp(mu=0.01)
    # order of vars in the system: x,y,z,px,py,pz (as defined)
    state = np.array([-0.45, 0.80, 0.00, -0.80, -0.45, 0.58])
    # state must match sys lhs order: [x, y, z, px, py, pz]
    ta = hy.taylor_adaptive(sys, state, tol=1e-15)
    jac = models.cr3bp_jacobi(mu=0.01)
    cf = hy.make_cfunc([jac], vars=["px", "py", "pz", "x", "y", "z"])

    def J(s):
        # s ordered as sys lhs: x,y,z,px,py,pz -> cfunc wants px,py,pz,x,y,z
        return float(np.asarray(cf(np.array([s[3], s[4], s[5], s[0], s[1], s[2]])))[0])

    j0 = J(ta.state)
    ta.propagate_until(20.0)
    j1 = J(ta.state)
    assert abs(j1 - j0) < 1e-12


def test_fixed_centres_energy():
    sys = models.fixed_centres(
        Gconst=1.0, masses=[1.0, 0.5], positions=[-1, 0, 0, 1, 0, 0]
    )
    state = np.array([0.0, 1.2, 0.1, -0.9, 0.0, 0.05])
    ta = hy.taylor_adaptive(sys, state, tol=1e-15)
    e_expr = models.fixed_centres_energy(
        Gconst=1.0, masses=[1.0, 0.5], positions=[-1, 0, 0, 1, 0, 0]
    )
    cf = hy.make_cfunc([e_expr], vars=["x", "y", "z", "vx", "vy", "vz"])
    e0 = float(np.asarray(cf(state))[0])
    ta.propagate_until(15.0)
    e1 = float(np.asarray(cf(ta.state))[0])
    assert abs((e1 - e0) / e0) < 1e-12


def test_mascon_energy():
    omega = [0.0, 0.0, 0.31]
    kw = dict(
        Gconst=1.0,
        masses=[0.3, 0.4, 0.3],
        positions=[-1, 0, 0, 0, 0.5, 0, 1, 0, 0],
        omega=omega,
    )
    sys = models.mascon(**kw)
    state = np.array([0.0, 2.0, 0.3, -0.4, 0.0, 0.1])
    ta = hy.taylor_adaptive(sys, state, tol=1e-15)
    cf = hy.make_cfunc(
        [models.mascon_energy(**kw)], vars=["x", "y", "z", "vx", "vy", "vz"]
    )
    e0 = float(np.asarray(cf(state))[0])
    ta.propagate_until(10.0)
    e1 = float(np.asarray(cf(ta.state))[0])
    assert abs((e1 - e0) / e0) < 1e-11


def test_ffnn():
    x = hy.make_vars("x")
    outs = models.ffnn([x], [3], 1, [hy.tanh, lambda e: e])
    assert len(outs) == 1
    from heyoka_tpu.models.ffnn import ffnn_par_count

    npar = ffnn_par_count(1, [3], 1)
    assert npar == 1 * 3 + 3 + 3 * 1 + 1
    rng = np.random.default_rng(0)
    w = rng.standard_normal(npar)
    cf = hy.make_cfunc(outs, vars=[x])
    got = float(np.asarray(cf(np.array([0.7]), pars=w))[0])
    # manual forward pass: reference flattened layout = all weights first
    # (row-major per layer), then all biases (ffnn.cpp:76-78)
    W1 = w[0:3].reshape(3, 1)
    W2 = w[3:6].reshape(1, 3)
    b1 = w[6:9]
    b2 = w[9:10]
    h = np.tanh(W1 @ np.array([0.7]) + b1)
    want = float((W2 @ h + b2)[0])
    assert abs(got - want) < 1e-12

    # explicit weights via nn_wb give the same result without params
    outs2 = models.ffnn([x], [3], 1, [hy.tanh, lambda e: e], nn_wb=w)
    cf2 = hy.make_cfunc(outs2, vars=[x])
    got2 = float(np.asarray(cf2(np.array([0.7])))[0])
    assert abs(got2 - want) < 1e-12


def test_lagrange_prop_circular():
    # circular orbit analytic propagation: mu=1, r0=(1,0,0), v0=(0,1,0)
    exprs = models.lagrange_prop(mu=1.0)
    cf = hy.make_cfunc(
        exprs, vars=["x0", "y0", "z0", "vx0", "vy0", "vz0"]
    )
    t = 1.3
    out = np.asarray(cf(np.array([1.0, 0, 0, 0, 1.0, 0]), time=t))
    want = np.array(
        [math.cos(t), math.sin(t), 0.0, -math.sin(t), math.cos(t), 0.0]
    )
    np.testing.assert_allclose(out, want, atol=1e-12)


def test_kepler_roundtrip():
    from heyoka_tpu.models import kepler_to_cartesian, cartesian_to_kepler

    el = (1.3, 0.25, 0.4, 1.1, 2.2, 0.7)
    st = kepler_to_cartesian(*el, mu=1.7)
    el2 = cartesian_to_kepler(st, mu=1.7)
    np.testing.assert_allclose(el2, el, atol=1e-12)
