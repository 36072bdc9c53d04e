"""Tutorial 10 — checkpoint / resume (reference: the s11n tutorial).

Everything pickles: integrators mid-flight resume bit-for-bit; the jax
persistent compilation cache plays the role of the reference's on-disk JIT
object cache.
"""

import io

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu.models import pendulum

ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
ta.propagate_until(42.0)

# checkpoint to a buffer (or a path: hy.s11n.save(ta, "ckpt.pkl"))
buf = io.BytesIO()
hy.s11n.save(ta, buf)
print("checkpoint size:", buf.tell(), "bytes at t =", ta.time)

# ... later / elsewhere: resume and continue
buf.seek(0)
ta2 = hy.s11n.load(buf)
ta.propagate_until(100.0)
ta2.propagate_until(100.0)
print("resumed identical:", bool(np.all(ta.state == ta2.state)))

# optional: persistent XLA compilation cache across processes
# hy.s11n.enable_compilation_cache()
