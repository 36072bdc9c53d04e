"""dd Pallas kernel: extended op-coverage equivalence tests (VERDICT r1 #3).

Each case integrates a tiny ODE whose RHS exercises one op family through
the dd Pallas jet kernel (interpret mode on CPU) and checks the final state
against the staged-XLA flat engine at f64 tolerance.  Mirrors the
reference's per-op Taylor sweeps (test/taylor_tan.cpp etc.) for the kernel
engine; kernel rules live in taylor/pallas_phase.py (_rule).
"""

import numpy as np
import pytest

#: compile-heavy module: slow tier (see tests/conftest.py)
pytestmark = pytest.mark.slow

import heyoka_tpu as hy

x, v = hy.make_vars("x", "v")

CASES = {
    "tan": (v, -hy.tan(x * 0.3)),
    "tanh": (v, -hy.tanh(x)),
    "sigmoid": (v, -hy.sigmoid(x) + 0.5),
    "asin": (v, -hy.asin(x * 0.5)),
    "acos": (v, hy.acos(x * 0.5) - np.pi / 2),
    "atan": (v, -hy.atan(x)),
    "erf": (v, -hy.erf(x)),
    "atan2": (v, -hy.atan2(x, 2.0 + v * 0.1)),
    "kepE": (v, -hy.sin(hy.kepE(0.1, x))),
    "kepF": (v, -hy.sin(hy.kepF(0.05, 0.05, x))),
    # c0 well below 1: at c0 = 1 the implicit equation's DE-derivative
    # vanishes at the origin and the trajectory is chaotic under roundoff
    "kepDE": (v, -hy.sin(hy.kepDE(0.05, 0.3, x))),
}

B = 8


@pytest.mark.parametrize("name", sorted(CASES))
def test_dd_kernel_op(name):
    sys_ = [(x, v), CASES[name]]
    st = np.tile([0.25, 0.0], (B, 1))
    tb = hy.taylor_adaptive_batch(
        sys_, st, tol=1e-9, compact_mode="flat", mp_order=6,
        pallas_phase="dd-interpret",
    )
    tb_ref = hy.taylor_adaptive_batch(sys_, st, tol=1e-9, compact_mode="flat")
    tb.propagate_until(np.full(B, 2.0))
    tb_ref.propagate_until(np.full(B, 2.0))
    np.testing.assert_allclose(
        np.asarray(tb.state), np.asarray(tb_ref.state), rtol=0, atol=5e-11
    )
