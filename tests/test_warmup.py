"""warmup(): concurrent driver compilation (cold-start latency API).

Reference parity: heyoka's parallel multi-state JIT (``llvm_multi_state``,
src/llvm_state.cpp) compiles its modules concurrently; here the analog is
compiling the step/propagate XLA programs on worker threads before first
use.
"""
import numpy as np
import pytest

#: compile-heavy module: slow tier (see tests/conftest.py)
pytestmark = pytest.mark.slow

import heyoka_tpu as hy
from heyoka_tpu.models import pendulum


def test_warmup_matches_unwarmed():
    B = 4
    states = np.tile([0.05, 0.025], (B, 1)) * (1 + 1e-5 * np.arange(B)[:, None])
    kw = dict(tol=1e-6, compact_mode="flat")
    ta = hy.taylor_adaptive_batch(pendulum(), states.copy(), **kw)
    tb = hy.taylor_adaptive_batch(pendulum(), states.copy(), **kw)
    out = tb.warmup()
    assert out is tb
    # warmup must not advance the integrator
    assert float(tb.time[0]) == 0.0
    np.testing.assert_array_equal(np.asarray(tb.state), states)
    ta.step()
    tb.step()
    np.testing.assert_array_equal(np.asarray(ta.state), np.asarray(tb.state))
    ta.propagate_until(1.0)
    tb.propagate_until(1.0)
    np.testing.assert_array_equal(np.asarray(ta.state), np.asarray(tb.state))


def test_warmup_with_events():
    B = 3
    states = np.tile([0.05, 0.025], (B, 1))
    x, v = hy.make_vars("x", "v")
    hits = []
    tb = hy.taylor_adaptive_batch(
        pendulum(), states, tol=1e-6, compact_mode="flat",
        nt_events=[hy.nt_event(v, lambda tb_, t, d, lane: hits.append(t))],
    )
    tb.warmup()
    assert float(tb.time[0]) == 0.0
    tb.propagate_until(4.0)
    assert hits  # v crosses zero within 4 time units
