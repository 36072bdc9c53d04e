#!/usr/bin/env python
"""Go/no-go prototype: VMEM-resident Pallas kernel for the f32 jet phase.

The staged XLA engine's per-order cost is proportional to the *full*
coefficient-buffer size (slice/DUS/copy bound, see PERF.md round-1 notes):
the f32 phase (orders mp+1..K) costs ~16 ms of the 31 ms step.  Here the
whole phase runs inside one pallas_call per batch tile with tc held as a
value (VMEM/registers), gathers unrolled as static row slices.

Validates the kernel against the identical value-semantics jnp body run
outside pallas, and times both against the staged XLA engine phase.
"""
import functools
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_phase_body(plan, lo, K, n_eq):
    """Return body(tc_value) -> tc_value running orders lo..K (f32 rules:
    mul/sum/pow — the nbody plan's full rule set) with value semantics."""
    import jax.numpy as jnp

    W = plan.width

    def _contig(cols):
        a = int(cols[0])
        return (a, a + cols.size) if np.array_equal(
            cols, np.arange(a, a + cols.size)) else None

    def grows(x, cols):
        # gather rows of a (W, ...) value with static indices
        r = _contig(cols)
        if r:
            return x[r[0]:r[1]]
        return jnp.concatenate([x[c:c + 1] for c in cols], axis=0)

    def body(tc):
        f32 = tc.dtype
        for k in range(lo, K + 1):
            kf = np.float32(k)
            prev = tc[:, k - 1, :]
            sv = grows(prev, plan.rhs_cols) / kf
            tc = tc.at[:n_eq, k, :].set(sv)
            for lv in plan.levels:
                for g in lv:
                    m = g.out_cols.size
                    if g.name == "sum":
                        rowk = tc[:, k, :]
                        acc = grows(rowk, g.in_cols[:, 0])
                        for a in range(1, g.in_cols.shape[1]):
                            acc = acc + grows(rowk, g.in_cols[:, a])
                        vals = acc
                    elif g.name == "mul":
                        # conv unrolled over j: static slices + scalar
                        # weights only (pallas kernels cannot capture
                        # constant arrays; also removes the reverse op)
                        A = grows(tc, g.in_cols[:, 0])
                        C = grows(tc, g.in_cols[:, 1])
                        vals = A[:, 0, :] * C[:, k, :]
                        for j in range(1, k + 1):
                            vals = vals + A[:, j, :] * C[:, k - j, :]
                    elif g.name == "pow":
                        au = np.unique(g.alpha)
                        assert au.size == 1, "prototype: uniform exponent"
                        alpha = float(au[0])
                        A = grows(tc, g.out_cols)
                        Bh = grows(tc, g.in_cols[:, 0])
                        # sum_{j<k} a_j b_{k-j} (alpha (k-j) - j) / (k b_0)
                        vals = A[:, 0, :] * Bh[:, k, :] * (alpha * kf)
                        for j in range(1, k):
                            w = np.float32(alpha * (k - j) - j)
                            vals = vals + A[:, j, :] * Bh[:, k - j, :] * w
                        vals = vals / (kf * Bh[:, 0, :])
                    else:
                        raise NotImplementedError(g.name)
                    tc = tc.at[g.out_start:g.out_start + m, k, :].set(vals)
        return tc

    return body


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import heyoka_tpu as hy
    # Mosaic cannot legalize i64 (see tools/microbench_pallas_conv.py);
    # this prototype is f32-only.  heyoka_tpu's import enables x64, so the
    # override must come after it.
    jax.config.update("jax_enable_x64", False)
    hy.s11n.enable_compilation_cache()
    from bench import IC, MASSES, GCONST
    from heyoka_tpu.models import nbody
    from heyoka_tpu.expr.decompose import taylor_decompose_sys
    from heyoka_tpu.taylor.compact_flat import build_plan

    K = 19
    LO = 9
    B = 10_240
    BT = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    tape = taylor_decompose_sys(nbody(6, masses=MASSES, Gconst=GCONST))
    plan = build_plan(tape, K)
    W = plan.width
    n_eq = plan.n_eq
    body = build_phase_body(plan, LO, K, n_eq)

    # -- realistic tc: order-0 evaluation host-side, then orders 1..LO-1
    # with the same jnp body rules
    rng = np.random.default_rng(0)
    states = (IC[None, :] + np.abs(IC)[None, :]
              * (rng.uniform(-1, 1, (B, IC.size)) * 1e-8)).astype(np.float32)
    tc0 = np.zeros((W, K + 1, B), np.float32)
    tc0[:n_eq, 0, :] = states.T
    for ci, cv in plan.const_cols:
        tc0[ci, 0, :] = cv
    row0 = tc0[:, 0, :]
    for lv in plan.levels:
        for g in lv:
            if g.name == "sum":
                vals = row0[g.in_cols].sum(axis=1)
            elif g.name == "mul":
                vals = row0[g.in_cols[:, 0]] * row0[g.in_cols[:, 1]]
            elif g.name == "pow":
                vals = row0[g.in_cols[:, 0]] ** g.alpha[:, None]
            else:
                raise NotImplementedError(g.name)
            row0[g.out_start:g.out_start + g.out_cols.size] = vals
    low_body = build_phase_body(plan, 1, LO - 1, n_eq)
    tc_in = jax.jit(low_body)(jnp.asarray(tc0))
    tc_in.block_until_ready()

    # -- plain jnp reference (value semantics, XLA)
    ref_fn = jax.jit(body)
    t_c0 = time.perf_counter()
    ref = ref_fn(tc_in)
    ref.block_until_ready()
    float(ref[0, K, 0])
    print(f"plain-jnp compile+run: {time.perf_counter()-t_c0:.1f}s", flush=True)

    # -- pallas kernel: ref stores (no scatter), operand histories as
    # per-order value lists (VMEM staging), convs unrolled over j
    from jax import lax

    def _contig(cols):
        a = int(cols[0])
        return (a, a + cols.size) if np.array_equal(
            cols, np.arange(a, a + cols.size)) else None

    def vrows(x, cols):
        r = _contig(cols)
        if r:
            return x[r[0]:r[1]]
        return jnp.concatenate([x[c:c + 1] for c in cols], axis=0)

    # operand column sets per group (for history staging)
    gops = []
    for lv in plan.levels:
        for g in lv:
            if g.name == "mul":
                gops.append((g, [g.in_cols[:, 0], g.in_cols[:, 1]]))
            elif g.name == "pow":
                gops.append((g, [g.out_cols, g.in_cols[:, 0]]))
            else:
                gops.append((g, []))

    def kernel(tc_ref, o_ref):
        o_ref[...] = tc_ref[...]
        # seed histories for orders 0..LO-1; contiguous column sets read
        # straight from o_ref instead (free slices, no VMEM duplication)
        hist = {}
        for gi, (g, colsets) in enumerate(gops):
            for ci, cols in enumerate(colsets):
                if _contig(cols):
                    continue
                rows = []
                for j in range(LO):
                    rows.append(vrows(o_ref[:, j, :], cols))
                hist[(gi, ci)] = rows

        def hrow(gi, ci, cols, j):
            h = hist.get((gi, ci))
            if h is not None:
                return h[j]
            r = _contig(cols)
            return o_ref[r[0]:r[1], j, :]
        for k in range(LO, K + 1):
            kf = np.float32(k)
            prev = o_ref[:, k - 1, :]
            sv = vrows(prev, plan.rhs_cols) / kf
            o_ref[0:n_eq, k, :] = sv
            # order-k gathers read the output ref after each group's store
            # (read-after-write in program order; Mosaic supports neither
            # value scatter nor value dynamic_update_slice)
            for gi, (g, colsets) in enumerate(gops):
                m = g.out_cols.size
                row_k = o_ref[:, k, :]
                if g.name == "sum":
                    vals = vrows(row_k, g.in_cols[:, 0])
                    for a in range(1, g.in_cols.shape[1]):
                        vals = vals + vrows(row_k, g.in_cols[:, a])
                elif g.name == "mul":
                    cA = g.in_cols[:, 0]
                    cC = g.in_cols[:, 1]
                    # rows k of A and C are appended after computing vals:
                    # a_k c_0 + a_0 c_k handled via row_k gathers
                    a_k = vrows(row_k, cA)
                    c_k = vrows(row_k, cC)
                    vals = hrow(gi, 0, cA, 0) * c_k + a_k * hrow(gi, 1, cC, 0)
                    for j in range(1, k):
                        vals = vals + hrow(gi, 0, cA, j) * hrow(gi, 1, cC, k - j)
                elif g.name == "pow":
                    au = np.unique(g.alpha)
                    alpha = float(au[0])
                    cA = g.out_cols     # out_cols history (orders < k)
                    cB = g.in_cols[:, 0]
                    b_k = vrows(row_k, cB)
                    vals = hrow(gi, 0, cA, 0) * b_k * np.float32(alpha * k)
                    for j in range(1, k):
                        w = np.float32(alpha * (k - j) - j)
                        vals = vals + hrow(gi, 0, cA, j) * hrow(gi, 1, cB, k - j) * w
                    vals = vals / (kf * hrow(gi, 1, cB, 0))
                else:
                    raise NotImplementedError(g.name)
                o_ref[g.out_start:g.out_start + m, k, :] = vals
            # append order-k operand rows to the histories
            row_k = o_ref[:, k, :]
            for gi, (g, colsets) in enumerate(gops):
                for ci, cols in enumerate(colsets):
                    if (gi, ci) in hist:
                        hist[(gi, ci)].append(vrows(row_k, cols))

    from jax.experimental.pallas import tpu as pltpu
    phase = pl.pallas_call(
        kernel,
        grid=(B // BT,),
        in_specs=[pl.BlockSpec((W, K + 1, BT), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((W, K + 1, BT), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((W, K + 1, B), jnp.float32),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    phase = jax.jit(phase)
    t_c0 = time.perf_counter()
    got = phase(tc_in)
    float(got[0, K, 0])
    print(f"pallas compile+first run: {time.perf_counter()-t_c0:.1f}s",
          flush=True)

    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f"max abs diff pallas vs jnp: {err:.3e} (scale {scale:.3e})",
          flush=True)

    def timeit(fn, x, reps=16):
        r = fn(x)
        float(r[0, K, 0])
        start = time.perf_counter()
        for _ in range(reps):
            r = fn(x)
        float(r[0, K, 0])
        return (time.perf_counter() - start) / reps

    d_ref = timeit(ref_fn, tc_in)
    d_pal = timeit(phase, tc_in)
    print(f"plain-jnp phase: {d_ref*1e3:8.2f} ms", flush=True)
    print(f"pallas    phase: {d_pal*1e3:8.2f} ms  (BT={BT})", flush=True)


if __name__ == "__main__":
    main()
