"""Docs-as-tests: run the fast tutorial scripts (reference analog:
readme_test.cpp + the tutorial/ build, SURVEY.md §4)."""

import pathlib
import runpy

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"

# the quick subset (the heavy ones — SGP4 day-long ephemeris, compact-mode
# n-body — run as part of their own test files)
FAST = [
    "01_pendulum.py",
    "04_events.py",
    "05_variational.py",
    "10_checkpointing.py",
    # geopotential LEO compiles ~100 s on CPU: slow tier
    pytest.param("13_physical_units_leo.py", marks=pytest.mark.slow),
]


@pytest.mark.parametrize("name", FAST)
def test_example_runs(name):
    runpy.run_path(str(EXAMPLES / name), run_name="__main__")


def test_readme_example():
    # the README front-page example, verbatim semantics
    import heyoka_tpu as hy

    x, v = hy.make_vars("x", "v")
    sys = [(x, v), (v, -9.8 * hy.sin(x))]
    ta = hy.taylor_adaptive(sys, [0.05, 0.025], tol=1e-15)
    ta.propagate_for(10.0)
    assert ta.state.shape == (2,)
    assert abs(ta.time - 10.0) < 1e-12
