"""VMEM-resident Pallas kernel for the high-order (f32) jet phase.

Reference parity: this is the TPU-native materialization of heyoka's
compact-mode jet computation (``taylor_compute_jet_compact_mode``,
``src/taylor_02.cpp:1194``) for the mixed-precision staged engine
(``compact_flat.py``): the per-order Taylor recurrences of orders
``lo..K`` run inside one Pallas kernel per batch tile, with the
coefficient buffer and the scattered-operand histories held in VMEM.

Why: the XLA formulation of the staged engine is slice/DUS/copy bound —
the per-order cost scales with the full coefficient-buffer width and only
~25% of the step is compute (see PERF.md round-1 third pass).  In-kernel,
the HBM round-trips between orders disappear: the f32 phase drops from
~16 ms to ~5 ms at the north-star workload (B=10240, W=381, orders 9..19).

Mosaic lowering constraints shape the kernel (measured, PERF.md):
- no value scatter / value dynamic_update_slice -> all order-k writes are
  *ref* stores with static offsets, later reads are read-after-write;
- no captured constant arrays -> convolutions are unrolled over the
  history index j with *scalar* weights (this also removes the reverse);
- no i64 -> index maps return int32, and the kernel must not create
  64-bit values even when the surrounding program runs with jax x64 on;
- scattered-row gathers -> unrolled static row slices + concatenate,
  gathered once per order into per-operand VMEM histories (the in-kernel
  analog of the staged engine's operand buffers).
"""

from __future__ import annotations

import numpy as np


class UnsupportedPallasOp(Exception):
    """A tape op group without an in-kernel recurrence rule."""


#: groups implemented in-kernel; everything else falls back to the XLA phase
_SUPPORTED = {
    "sum", "mul", "pow", "div", "exp", "sin", "cos", "sinh", "cosh",
    "log", "sqrt",
}


def supported(plan) -> bool:
    return all(
        g.name in _SUPPORTED for lv in plan.levels for g in lv
    )


def _contig(cols):
    a = int(cols[0])
    return (a, a + int(cols.size)) if np.array_equal(
        cols, np.arange(a, a + cols.size)) else None


def make_phase_kernel(plan, lo: int, K: int, B: int, *, bt: int = 128,
                      interpret: bool = False):
    """Build ``phase(tc32 (W, K+1, B) f32) -> tc32`` running Taylor orders
    ``lo..K`` in a Pallas kernel (grid over batch tiles of ``bt`` lanes).

    ``interpret=True`` runs the kernel in pallas interpret mode (CPU tests).
    Raises :class:`UnsupportedPallasOp` for tapes outside the rule set.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    for lv in plan.levels:
        for g in lv:
            if g.name not in _SUPPORTED:
                raise UnsupportedPallasOp(g.name)
            if g.name == "pow" and np.unique(np.asarray(g.alpha)).size > 1:
                # mixed exponents would need the alpha vector as a kernel
                # input (Mosaic forbids captured constant arrays); the XLA
                # phase handles those tapes
                raise UnsupportedPallasOp("pow (mixed exponents)")

    W = plan.width
    n_eq = plan.n_eq
    bt = min(bt, B)
    if B % bt != 0:
        raise ValueError(f"batch {B} not divisible by tile {bt}")

    # operand column sets whose histories are staged in VMEM (scattered
    # only; contiguous sets are free slices of the coefficient block)
    def _opsets(g):
        if g.name == "mul":
            return [g.in_cols[:, 0], g.in_cols[:, 1]]
        if g.name == "pow":
            return [g.out_cols, g.in_cols[:, 0]]
        if g.name == "div":
            return [g.out_cols, g.in_cols[:, 1]]
        if g.name in ("exp", "sqrt"):
            return [g.out_cols, g.in_cols[:, 0]]
        if g.name == "log":
            return [g.out_cols, g.in_cols[:, 0]]
        if g.name in ("sin", "sinh", "cos", "cosh"):
            return [g.in_cols[:, 0], g.aux["pair"]]
        return []

    gops = []
    for lv in plan.levels:
        for g in lv:
            gops.append((g, _opsets(g)))

    def kernel(tc_ref, o_ref):
        f32 = np.float32
        o_ref[...] = tc_ref[...]

        def _vrows(x, cols):
            r = _contig(cols)
            if r:
                return x[r[0]:r[1]]
            return jnp.concatenate([x[c:c + 1] for c in cols], axis=0)

        hist: dict = {}
        for gi, (g, colsets) in enumerate(gops):
            for ci, cols in enumerate(colsets):
                if _contig(cols):
                    continue
                hist[(gi, ci)] = [
                    _vrows(o_ref[:, j, :], cols) for j in range(lo)
                ]

        def hrow(gi, ci, cols, j):
            h = hist.get((gi, ci))
            if h is not None:
                return h[j]
            r = _contig(cols)
            return o_ref[r[0]:r[1], j, :]

        for k in range(lo, K + 1):
            kf = f32(k)
            prev = o_ref[:, k - 1, :]
            sv = _vrows(prev, plan.rhs_cols) / kf
            o_ref[0:n_eq, k, :] = sv

            for gi, (g, colsets) in enumerate(gops):
                m = g.out_cols.size
                row_k = o_ref[:, k, :]
                name = g.name
                if name == "sum":
                    vals = _vrows(row_k, g.in_cols[:, 0])
                    for a in range(1, g.in_cols.shape[1]):
                        vals = vals + _vrows(row_k, g.in_cols[:, a])
                elif name == "mul":
                    cA, cC = g.in_cols[:, 0], g.in_cols[:, 1]
                    a_k = _vrows(row_k, cA)
                    c_k = _vrows(row_k, cC)
                    vals = hrow(gi, 0, cA, 0) * c_k + a_k * hrow(gi, 1, cC, 0)
                    for j in range(1, k):
                        vals = vals + hrow(gi, 0, cA, j) * hrow(gi, 1, cC, k - j)
                elif name == "pow":
                    # c_k = sum_{j<k} c_j b_{k-j} (alpha(k-j) - j) / (k b_0)
                    # (uniform exponent per group, enforced in the preamble)
                    cA, cB = g.out_cols, g.in_cols[:, 0]
                    b_k = _vrows(row_k, cB)
                    av = float(np.unique(np.asarray(g.alpha))[0])
                    vals = hrow(gi, 0, cA, 0) * b_k * f32(av * k)
                    for j in range(1, k):
                        w = f32(av * (k - j) - j)
                        vals = vals + hrow(gi, 0, cA, j) \
                            * hrow(gi, 1, cB, k - j) * w
                    vals = vals / (kf * hrow(gi, 1, cB, 0))
                elif name == "div":
                    # c_k = (a_k - sum_{j<k} c_j d_{k-j}) / d_0
                    cC, cD = g.out_cols, g.in_cols[:, 1]
                    a_k = _vrows(row_k, g.in_cols[:, 0])
                    s = hrow(gi, 0, cC, 0) * _vrows(row_k, cD)
                    for j in range(1, k):
                        s = s + hrow(gi, 0, cC, j) * hrow(gi, 1, cD, k - j)
                    vals = (a_k - s) / hrow(gi, 1, cD, 0)
                elif name == "exp":
                    # e_k = (1/k) sum_{j=1..k} j b_j e_{k-j}
                    cE, cB = g.out_cols, g.in_cols[:, 0]
                    b_k = _vrows(row_k, cB)
                    vals = f32(k) * b_k * hrow(gi, 0, cE, 0)
                    for j in range(1, k):
                        vals = vals + f32(j) * hrow(gi, 1, cB, j) \
                            * hrow(gi, 0, cE, k - j)
                    vals = vals / kf
                elif name in ("sin", "sinh", "cos", "cosh"):
                    # s_k = (sign/k) sum_{j=1..k} j b_j p_{k-j}
                    sign = -1.0 if name == "cos" else 1.0
                    cB, cP = g.in_cols[:, 0], g.aux["pair"]
                    b_k = _vrows(row_k, cB)
                    vals = f32(k) * b_k * hrow(gi, 1, cP, 0)
                    for j in range(1, k):
                        vals = vals + f32(j) * hrow(gi, 0, cB, j) \
                            * hrow(gi, 1, cP, k - j)
                    vals = vals * f32(sign / k)
                elif name == "log":
                    # c_k = (b_k - (1/k) sum_{j=1..k-1} j c_j b_{k-j}) / b_0
                    cC, cB = g.out_cols, g.in_cols[:, 0]
                    b_k = _vrows(row_k, cB)
                    s = jnp.zeros_like(b_k)
                    for j in range(1, k):
                        s = s + f32(j) * hrow(gi, 0, cC, j) \
                            * hrow(gi, 1, cB, k - j)
                    vals = (b_k - s / kf) / hrow(gi, 1, cB, 0)
                elif name == "sqrt":
                    # c_k = (b_k - sum_{j=1..k-1} c_j c_{k-j}) / (2 c_0)
                    cC = g.out_cols
                    b_k = _vrows(row_k, g.in_cols[:, 0])
                    s = jnp.zeros_like(b_k)
                    for j in range(1, k):
                        s = s + hrow(gi, 0, cC, j) * hrow(gi, 0, cC, k - j)
                    vals = (b_k - s) / (2.0 * hrow(gi, 0, cC, 0))
                else:  # pragma: no cover - filtered in the preamble
                    raise UnsupportedPallasOp(name)
                o_ref[g.out_start:g.out_start + m, k, :] = vals

            row_k = o_ref[:, k, :]
            for gi, (g, colsets) in enumerate(gops):
                for ci, cols in enumerate(colsets):
                    if (gi, ci) in hist:
                        hist[(gi, ci)].append(_vrows(row_k, cols))

    z32 = np.int32(0)
    call_kw = dict(
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((W, K + 1, bt), lambda i: (z32, z32, i))],
        out_specs=pl.BlockSpec((W, K + 1, bt), lambda i: (z32, z32, i)),
        out_shape=jax.ShapeDtypeStruct((W, K + 1, B), jnp.float32),
        input_output_aliases={0: 0},
    )
    if interpret:
        call_kw["interpret"] = True
    else:
        from jax.experimental.pallas import tpu as pltpu

        call_kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(kernel, **call_kw)
