"""Rolled-order row-split Pallas kernel (huge-tape compile-time fix).

The rolled kernel runs the Taylor orders inside ``lax.fori_loop``s over an
ORDER-MAJOR coefficient buffer, emitting O(#groups) Mosaic statements
instead of the unrolled kernels' O(K^2 · chunks · groups) (the measured
1,401 s Mosaic compile at mascon-256, PERF.md round 4).  Values are NOT
bit-identical to the unrolled kernels (sequential convolution accumulation
vs blockified tree reductions — same error budget, different association),
so these tests assert dd-level closeness against the plain f64 staged
engine and the dense dd kernel.

Reference context: compact/parallel mode are the reference's huge-ODE
machinery (src/taylor_02.cpp:1194, taylor_01.cpp:1202).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from heyoka_tpu.expr.decompose import taylor_decompose_sys
from heyoka_tpu.models import mascon, fixed_centres
from heyoka_tpu.taylor import pallas_phase as pp
from heyoka_tpu.taylor.compact_flat import (
    jit_flat_step,
    make_batched_step_flat,
)


def _mascon_tape(N=12, seed=7):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.0, 1.0, (4 * N, 3))
    pts = pts[np.linalg.norm(pts, axis=1) <= 1.0][:N]
    masses = rng.uniform(0.5, 1.0, N)
    masses /= masses.sum()
    sys_ = mascon(Gconst=1.0, masses=masses.tolist(),
                  positions=pts.tolist(), omega=(0.0, 0.0, 0.3))
    return taylor_decompose_sys(sys_)


def _orbit_states(B, seed=3):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, B)
    st = np.zeros((B, 6))
    st[:, 0] = 2.0 * np.cos(ang)
    st[:, 1] = 2.0 * np.sin(ang)
    st[:, 3] = -0.7 * np.sin(ang)
    st[:, 4] = 0.7 * np.cos(ang)
    return st


@pytest.fixture
def small_groups(monkeypatch):
    monkeypatch.setenv("HEYOKA_PLAN_SORT_MIN", "8")
    monkeypatch.setattr(pp, "_STAGE_SKIP_MIN", 8)


def test_rolled_supported_gating():
    tape = _mascon_tape()
    from heyoka_tpu.taylor.compact import build_plan

    plan = build_plan(tape, 9)
    assert pp.rolled_supported(plan)  # sum/mul/pow only

    import heyoka_tpu as hy

    x, v = hy.make_vars("x", "v")
    sys_ = [(x, v), (v, -hy.sin(x))]
    plan2 = build_plan(taylor_decompose_sys(sys_), 9)
    # sin has no dd order-0 rule -> rolled unsupported, falls back
    assert not pp.rolled_supported(plan2)


def test_rolled_matches_dense_and_oracle(small_groups, monkeypatch):
    tape = _mascon_tape()
    B, ORDER = 2, 9
    st = jnp.asarray(_orbit_states(B))
    p = jnp.zeros((B, 0))
    t = jnp.zeros((B,))
    mdt = jnp.full((B,), 1e9)

    kw = dict(dtype=jnp.float64, high_accuracy=True, mp_order=5,
              layout="3d", unroll=True, staged=True)
    # plain f64 staged engine (no pallas) = oracle
    n0, h0 = jit_flat_step(make_batched_step_flat(
        tape, ORDER, pallas_phase=False, **kw))(st, p, t, mdt)
    # dense dd kernel
    n1, h1 = jit_flat_step(make_batched_step_flat(
        tape, ORDER, pallas_phase="dd-interpret", **kw))(st, p, t, mdt)
    # rolled kernel (forced)
    monkeypatch.setenv("HEYOKA_PALLAS_ROLLED", "1")
    n2, h2 = jit_flat_step(make_batched_step_flat(
        tape, ORDER, pallas_phase="dd-interpret", **kw))(st, p, t, mdt)

    n0, n1, n2 = map(np.asarray, (n0, n1, n2))
    h0, h1, h2 = map(np.asarray, (h0, h1, h2))
    # rolled vs dense dd kernel: same arithmetic, different association
    np.testing.assert_allclose(n2, n1, rtol=0, atol=5e-13)
    np.testing.assert_allclose(h2, h1, rtol=5e-13)
    # rolled vs f64 oracle: sanity at the dd+f32-tail engine budget
    # (the dense dd kernel sits at the same ~1e-9 distance from pure
    # f64 in this mp_order=5/order-9 config; the tight assertion is
    # rolled==dense above)
    scale = np.max(np.abs(n0))
    assert np.max(np.abs(n2 - n0)) < 1e-8 * scale
    np.testing.assert_allclose(h2, h0, rtol=1e-7)


def test_rolled_fixed_centres(small_groups, monkeypatch):
    # second op mix (sum/mul/pow/sqrt paths of the fixed-centres tape)
    rng = np.random.default_rng(5)
    N = 10
    pos = rng.uniform(-1, 1, (N, 3))
    masses = rng.uniform(0.1, 1.0, N)
    sys_ = fixed_centres(Gconst=1.0, masses=masses.tolist(),
                         positions=pos.tolist())
    tape = taylor_decompose_sys(sys_)
    B, ORDER = 2, 11
    st = jnp.asarray(_orbit_states(B, seed=11) * 1.5)
    p = jnp.zeros((B, 0))
    t = jnp.zeros((B,))
    mdt = jnp.full((B,), 1e9)
    kw = dict(dtype=jnp.float64, high_accuracy=True, mp_order=5,
              layout="3d", unroll=True, staged=True)
    n0, h0 = jit_flat_step(make_batched_step_flat(
        tape, ORDER, pallas_phase=False, **kw))(st, p, t, mdt)
    monkeypatch.setenv("HEYOKA_PALLAS_ROLLED", "1")
    n2, h2 = jit_flat_step(make_batched_step_flat(
        tape, ORDER, pallas_phase="dd-interpret", **kw))(st, p, t, mdt)
    n0, n2 = np.asarray(n0), np.asarray(n2)
    assert np.max(np.abs(n2 - n0)) < 1e-8 * np.max(np.abs(n0))
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h0), rtol=1e-7)


def test_rolled_propagation_energy(small_groups, monkeypatch):
    # multi-step propagation through the rolled kernel conserves energy
    from heyoka_tpu.models import mascon_energy
    import heyoka_tpu as hy
    import jax
    from jax import lax

    rng = np.random.default_rng(7)
    N = 12
    pts = rng.uniform(-1.0, 1.0, (4 * N, 3))
    pts = pts[np.linalg.norm(pts, axis=1) <= 1.0][:N]
    masses = rng.uniform(0.5, 1.0, N)
    masses /= masses.sum()
    omega = (0.0, 0.0, 0.3)
    sys_ = mascon(Gconst=1.0, masses=masses.tolist(),
                  positions=pts.tolist(), omega=omega)
    tape = taylor_decompose_sys(sys_)
    monkeypatch.setenv("HEYOKA_PALLAS_ROLLED", "1")
    B, ORDER, NS = 2, 13, 12
    step = make_batched_step_flat(
        tape, ORDER, dtype=jnp.float64, high_accuracy=True, mp_order=5,
        layout="3d", unroll=True, staged=True,
        pallas_phase="dd-interpret")
    st = jnp.asarray(_orbit_states(B))
    p = jnp.zeros((B, 0))
    mdt = jnp.full((B,), jnp.inf)

    from heyoka_tpu.dfloat import dd_add_d

    def run(s, th, tl):
        def body(c):
            s_, th_, tl_, i = c
            ns, h = step(s_, p, th_, mdt)
            th2, tl2 = dd_add_d(th_, tl_, h)
            return (ns, th2, tl2, i + 1)

        return lax.while_loop(lambda c: c[3] < NS, body,
                              (s, th, tl, jnp.int32(0)))

    z = jnp.zeros((B,))
    out = jit_flat_step(run)(st, z, z)
    en = hy.make_cfunc(
        [mascon_energy(Gconst=1.0, masses=masses.tolist(),
                       positions=pts.tolist(), omega=omega)],
        vars=["x", "y", "z", "vx", "vy", "vz"], dtype=jnp.float64,
    )
    p0 = jnp.zeros((0,), jnp.float64)
    tz = jnp.asarray(0.0, jnp.float64)
    e0 = jax.vmap(lambda s: en._single(s, p0, tz)[0])(st)
    e1 = jax.vmap(lambda s: en._single(s, p0, tz)[0])(out[0])
    drift = float(jnp.max(jnp.abs((e1 - e0) / e0)))
    assert np.isfinite(drift) and drift < 1e-11
    assert float(jnp.min(out[1])) > 0.5  # really advanced


def test_auto_bt_rolled_model():
    tape = _mascon_tape(N=16)
    from heyoka_tpu.taylor.compact import build_plan

    plan = build_plan(tape, 19)
    bt = pp.auto_bt_rolled(plan, 8, 19, 1024)
    assert bt == 128
