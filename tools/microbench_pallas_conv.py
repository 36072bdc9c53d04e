#!/usr/bin/env python
"""Pallas prototype: VMEM-resident triangular Taylor convolution.

Measures the locality headroom identified by tools/microbench_dd.py —
the XLA elementwise formulation of ``c_k = sum_j a_j b_{k-j}`` is
HBM-bound (~70 GB/s effective), so precision choice barely matters.
Here the whole (K, block) history tile lives in VMEM and the k/j loops
are unrolled on-core, in f32 and in dd32 (double-float).

Run on the TPU:  python tools/microbench_pallas_conv.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x64 disabled: Mosaic cannot legalize i64 grid indices;
# the f64 accuracy reference is computed host-side in numpy
jax.config.update("jax_enable_x64", False)

K = 20
M = 20
B = 10240
N = M * B          # 204800
NB = 2048          # lane-block per kernel instance (multiple of 128)

SPLIT = np.float32(4097.0)


def conv_kernel_f32(a_ref, b_ref, o_ref):
    a = a_ref[:]        # (K, NB) in VMEM
    b = b_ref[:]
    for k in range(K):
        c = a[0] * b[k]
        for j in range(1, k + 1):
            c = c + a[j] * b[k - j]
        o_ref[k, :] = c


def conv_pallas_f32(a, b):
    grid = (N // NB,)
    spec = pl.BlockSpec((K, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        conv_kernel_f32,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
    )(a, b)


def _two_sum(x, y):
    s = x + y
    bb = s - x
    e = (x - (s - bb)) + (y - bb)
    return s, e


def conv_kernel_dd(ahi_ref, alo_ref, bhi_ref, blo_ref, ohi_ref, olo_ref):
    ahi, alo = ahi_ref[:], alo_ref[:]
    bhi, blo = bhi_ref[:], blo_ref[:]
    # cached Dekker splits of the hi parts
    ta = SPLIT * ahi
    ah = ta - (ta - ahi)
    al = ahi - ah
    tb = SPLIT * bhi
    bh = tb - (tb - bhi)
    bl = bhi - bh
    for k in range(K):
        shi = jnp.zeros_like(ahi[0])
        slo = jnp.zeros_like(ahi[0])
        for j in range(k + 1):
            p = ahi[j] * bhi[k - j]
            e = ((ah[j] * bh[k - j] - p) + ah[j] * bl[k - j]
                 + al[j] * bh[k - j]) + al[j] * bl[k - j]
            e = e + ahi[j] * blo[k - j] + alo[j] * bhi[k - j]
            shi, e2 = _two_sum(shi, p)
            slo = slo + (e + e2)
        s, e3 = _two_sum(shi, slo)
        ohi_ref[k, :] = s
        olo_ref[k, :] = e3


def conv_pallas_dd(ahi, alo, bhi, blo):
    grid = (N // NB,)
    spec = pl.BlockSpec((K, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        conv_kernel_dd,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((K, N), jnp.float32)] * 2,
    )(ahi, alo, bhi, blo)


def timeit(fn, args, reps=16):
    r = fn(*args)
    first = r[0] if isinstance(r, (tuple, list)) else r
    _ = float(jnp.asarray(first).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        r = fn(*args)
    first = r[0] if isinstance(r, (tuple, list)) else r
    _ = float(jnp.asarray(first).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    a64 = rng.standard_normal((K, N))
    b64 = rng.standard_normal((K, N))
    macs = K * (K + 1) / 2 * N

    # f64 accuracy reference, host-side (XLA f64 timing: see
    # tools/microbench_dd.py — 10.1 ms at these shapes)
    c64 = np.zeros((K, N))
    for k in range(K):
        for j in range(k + 1):
            c64[k] += a64[j] * b64[k - j]
    t_f64 = 10.10e-3

    a32 = jnp.asarray(a64, jnp.float32)
    b32 = jnp.asarray(b64, jnp.float32)
    t_p32 = timeit(jax.jit(conv_pallas_f32), (a32, b32))
    c32 = np.asarray(jax.jit(conv_pallas_f32)(a32, b32), np.float64)

    ahi = a64.astype(np.float32)
    alo = (a64 - ahi.astype(np.float64)).astype(np.float32)
    bhi = b64.astype(np.float32)
    blo = (b64 - bhi.astype(np.float64)).astype(np.float32)
    ddin = tuple(jnp.asarray(x) for x in (ahi, alo, bhi, blo))
    t_pdd = timeit(jax.jit(conv_pallas_dd), ddin)
    chi, clo = jax.jit(conv_pallas_dd)(*ddin)
    cdd = np.asarray(chi, np.float64) + np.asarray(clo, np.float64)

    rel32 = (np.abs(c32 - c64) / np.maximum(1.0, np.abs(c64))).max()
    reldd = (np.abs(cdd - c64) / np.maximum(1.0, np.abs(c64))).max()

    print(f"XLA f64        : {t_f64*1e3:8.2f} ms  {macs/t_f64/1e9:7.1f} GMAC/s")
    print(f"Pallas f32     : {t_p32*1e3:8.2f} ms  {macs/t_p32/1e9:7.1f} GMAC/s "
          f"({t_f64/t_p32:5.1f}x vs XLA f64)  rel err {rel32:.2e}")
    print(f"Pallas dd32    : {t_pdd*1e3:8.2f} ms  {macs/t_pdd/1e9:7.1f} GMAC/s "
          f"({t_f64/t_pdd:5.1f}x vs XLA f64)  rel err {reldd:.2e}")


if __name__ == "__main__":
    main()
