"""Per-op Taylor-coefficient recurrence checks against the symbolic oracle.

Reference analog: the ~40 ``test/taylor_*.cpp`` files — for each math
function, build a tiny ODE, compute one jet, and compare every coefficient
against an independently derived value.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import heyoka_tpu as hy
from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.taylor.jet import make_jet_fn

from oracle import taylor_coeffs_oracle

ORDER = 7


def check_jet(sys, state0, order=ORDER, pars=None, t0=0.0, rtol=1e-11):
    tape = taylor_decompose_sys(sys)
    jet = make_jet_fn(tape, order)
    n_pars = tape.n_pars
    p = jnp.zeros((n_pars,)) if pars is None else jnp.asarray(pars, jnp.float64)
    tc = np.asarray(
        jet(jnp.asarray(state0, jnp.float64), p, jnp.asarray(t0, jnp.float64))
    )
    want = taylor_coeffs_oracle(sys, state0, order, pars=pars, t0=t0)
    scale = np.maximum(1.0, np.abs(want))
    np.testing.assert_allclose(
        tc[:, : len(state0)], want, rtol=rtol, atol=rtol, err_msg=str(sys)
    )


x_, y_ = hy.make_vars("x", "y")


@pytest.mark.parametrize(
    "rhs,state0",
    [
        (hy.sin(x_), [0.7]),
        (hy.cos(x_), [0.7]),
        (hy.sin(x_) + hy.cos(x_), [0.3]),
        (hy.tan(x_), [0.4]),
        (hy.exp(-x_), [0.5]),
        (hy.log(x_), [1.7]),
        (hy.sqrt(x_), [2.3]),
        (x_ ** (-1.5), [1.9]),
        (x_**3, [0.8]),
        (x_**2.5, [1.2]),
        (hy.sinh(x_), [0.4]),
        (hy.cosh(x_), [0.4]),
        (hy.tanh(x_), [0.4]),
        (hy.asin(x_), [0.3]),
        (hy.acos(x_), [0.3]),
        (hy.atan(x_), [0.6]),
        (hy.asinh(x_), [0.6]),
        (hy.acosh(x_ + 2.0), [0.5]),
        (hy.atanh(x_), [0.4]),
        (hy.erf(x_), [0.3]),
        (hy.sigmoid(x_), [0.2]),
        (1.0 / x_, [1.4]),
        (hy.time * x_, [0.9]),
        (hy.sin(hy.time), [0.1]),
    ],
)
def test_single_var_ops(rhs, state0):
    check_jet([(x_, rhs)], state0)


@pytest.mark.parametrize(
    "rhs_x,rhs_y,state0",
    [
        (y_, -9.8 * hy.sin(x_), [0.05, 0.025]),  # pendulum
        (x_ * y_, x_ - y_, [0.7, 0.4]),
        (x_ / y_, y_ / (x_ + y_), [0.7, 1.4]),
        (hy.atan2(y_, x_), hy.atan2(x_, y_), [0.8, 0.6]),
        (hy.sin(y_) * hy.cos(x_), hy.exp(x_ * y_ * 0.1), [0.3, 0.2]),
    ],
)
def test_two_var_ops(rhs_x, rhs_y, state0):
    check_jet([(x_, rhs_x), (y_, rhs_y)], state0)


def test_params_in_rhs():
    check_jet(
        [(x_, hy.par[0] * hy.sin(x_) + hy.par[1])],
        [0.6],
        pars=[1.3, -0.2],
    )


def test_kepE_jet():
    # eccentricity and mean anomaly both varying
    check_jet(
        [(x_, hy.kepE(0.3 * hy.sin(x_) * hy.sin(x_) + 0.1, y_)), (y_, x_)],
        [0.5, 0.8],
        rtol=1e-10,
    )


def test_kepE_const_ecc():
    check_jet([(x_, hy.kepE(0.25, x_))], [0.7], rtol=1e-10)


def test_time_dependent():
    check_jet(
        [(x_, hy.cos(hy.time) * x_ - hy.time**2)],
        [0.4],
        t0=0.3,
    )


def test_relu_select():
    check_jet([(x_, hy.relu(x_ - 0.2) + 0.5)], [0.5])
    # select with smooth branches
    tape = taylor_decompose_sys([(x_, hy.select(hy.gt(x_, 0.0), x_ * x_, -x_))])
    jet = make_jet_fn(tape, 5)
    tc = np.asarray(jet(jnp.asarray([0.5]), jnp.zeros((0,)), jnp.asarray(0.0)))
    # for x0>0 this is x' = x^2 -> x1 = x0^2, x2 = x0^3, ...
    assert abs(tc[1, 0] - 0.25) < 1e-14
    assert abs(tc[2, 0] - 0.5 * 2 * 0.5 * 0.25) < 1e-14
