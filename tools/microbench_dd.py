#!/usr/bin/env python
"""Microbenchmark: Taylor-convolution arithmetic options on TPU.

The jet engine's hot loop is the triangular convolution
``c_k = sum_j a_j * b_{k-j}`` over the coefficient history.  This compares,
at the north-star workload's shapes (K=20 orders, N = m ops x B lanes):

  f64    — XLA's emulated double (the current low-order phase)
  f32    — single precision (the current high-order phase)
  dd32   — double-float (two-f32, Dekker/Knuth error-free transforms,
           ~2^-48 unit roundoff) with per-buffer cached splits

plus a correctness check of dd32 against f64.  Timing closes with a host
value read (block_until_ready does not synchronize on the axon tunnel —
see PERF.md "Measurement integrity").

Run on the TPU:  python tools/microbench_dd.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

K = 20          # taylor order
M = 20          # ops per group (typical n-body mul group)
B = 10240       # trajectories
N = M * B

SPLIT = np.float32(4097.0)  # 2^12 + 1 (Dekker split constant for f32)


def conv_plain(a, b):
    # c_k = sum_{j<=k} a_j b_{k-j}; unrolled triangular conv (exact work)
    outs = []
    for k in range(K):
        c = a[0] * b[k]
        for j in range(1, k + 1):
            c = c + a[j] * b[k - j]
        outs.append(c)
    return jnp.stack(outs)


def dd_split(x):
    # Dekker split: x = xh + xl with xh carrying the top 12 bits
    t = SPLIT * x
    xh = t - (t - x)
    return xh, x - xh


def two_prod_cached(a, ah, al, b, bh, bl):
    # exact product using cached splits: p + e == a*b
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def conv_dd(ahi, alo, bhi, blo):
    # dd accumulation of the triangular conv; splits cached per buffer
    ah, al = dd_split(ahi)
    bh, bl = dd_split(bhi)
    outs_hi, outs_lo = [], []
    for k in range(K):
        shi = jnp.zeros_like(ahi[0])
        slo = jnp.zeros_like(ahi[0])
        for j in range(k + 1):
            # dd product (sloppy low term: hi*lo cross terms in f32)
            p, e = two_prod_cached(
                ahi[j], ah[j], al[j], bhi[k - j], bh[k - j], bl[k - j]
            )
            e = e + ahi[j] * blo[k - j] + alo[j] * bhi[k - j]
            # dd accumulate
            shi, e2 = two_sum(shi, p)
            slo = slo + (e + e2)
        s, e3 = two_sum(shi, slo)
        outs_hi.append(s)
        outs_lo.append(e3)
    return jnp.stack(outs_hi), jnp.stack(outs_lo)


def timeit(fn, args, reps=8):
    r = fn(*args)  # compile
    first = r[0] if isinstance(r, tuple) else r
    _ = float(jnp.asarray(first).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        r = fn(*args)
    first = r[0] if isinstance(r, tuple) else r
    _ = float(jnp.asarray(first).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind)
    rng = np.random.default_rng(0)
    a64 = rng.standard_normal((K, N))
    b64 = rng.standard_normal((K, N))

    # f64
    f64 = jax.jit(conv_plain)
    t_f64 = timeit(f64, (jnp.asarray(a64), jnp.asarray(b64)))

    # f32
    f32in = (jnp.asarray(a64, jnp.float32), jnp.asarray(b64, jnp.float32))
    t_f32 = timeit(jax.jit(conv_plain), f32in)

    # dd32: split f64 inputs into (hi, lo) f32 pairs
    ahi = a64.astype(np.float32)
    alo = (a64 - ahi.astype(np.float64)).astype(np.float32)
    bhi = b64.astype(np.float32)
    blo = (b64 - bhi.astype(np.float64)).astype(np.float32)
    ddin = tuple(jnp.asarray(x) for x in (ahi, alo, bhi, blo))
    dd = jax.jit(conv_dd)
    t_dd = timeit(dd, ddin)

    # correctness: dd vs f64
    c64 = np.asarray(f64(jnp.asarray(a64), jnp.asarray(b64)))
    chi, clo = dd(*ddin)
    cdd = np.asarray(chi, np.float64) + np.asarray(clo, np.float64)
    rel = np.abs(cdd - c64) / np.maximum(1.0, np.abs(c64))
    c32 = np.asarray(jax.jit(conv_plain)(*f32in), np.float64)
    rel32 = np.abs(c32 - c64) / np.maximum(1.0, np.abs(c64))

    print(f"f64  : {t_f64*1e3:8.2f} ms")
    print(f"f32  : {t_f32*1e3:8.2f} ms   ({t_f64/t_f32:5.1f}x vs f64)  max rel err {rel32.max():.2e}")
    print(f"dd32 : {t_dd*1e3:8.2f} ms   ({t_f64/t_dd:5.1f}x vs f64)  max rel err {rel.max():.2e}")


if __name__ == "__main__":
    main()
