"""Micro-profile of the natively batched event step's components (round 2).

Times each stage of build_event_step_batch on the current device for the
batched Henon-Heiles Poincare workload.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_events2.py [B]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import heyoka_tpu as hy

hy.s11n.enable_compilation_cache()

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

x, y, px, py = hy.make_vars("x", "y", "px", "py")
sys_ = [(x, px), (y, py), (px, -x - 2.0 * x * y),
        (py, -y - (x * x - y * y))]
ic = [0.0, 0.1, 0.35, 0.1]
rng = np.random.default_rng(0)
states = np.asarray(ic)[None, :] + 1e-3 * rng.standard_normal((B, 4))

ev = hy.nt_event(y, lambda ta, t, d, lane: None,
                 direction=hy.EventDirection.positive)
tab = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                               high_accuracy=True, nt_events=[ev])
tab_p = hy.taylor_adaptive_batch(sys_, states, tol=1e-15,
                                 high_accuracy=True)
dtype = tab._dtype
st = jnp.asarray(states, dtype)
pars = jnp.zeros((B, 0), dtype)
t_hi = jnp.zeros((B,), dtype)
t_lo = jnp.zeros((B,), dtype)
mdt = jnp.full((B,), jnp.inf, dtype)
cds = tab._te_cooldowns


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    el = (time.perf_counter() - t0) / n
    print(f"{name:44s} {el * 1e3:9.3f} ms/call", flush=True)
    return el


timeit("plain step (_step_jit)", tab_p._step_jit, st, pars, t_hi, t_lo, mdt)
timeit("batched event step (_ev_step)", tab._ev_step, st, pars, t_hi, t_lo,
       mdt, cds)

from heyoka_tpu.taylor import events_impl as EI
from heyoka_tpu.taylor import stepper as _st

order = tab._order
n_eq = 4
fns = tab._fns

# stage A: jet + h + update only
def jet_h(st_, pars_, th_, mdt_):
    tc = jax.vmap(fns.jet)(st_, pars_, th_)
    h = jax.vmap(lambda c, m: _st.determine_h(c, order, n_eq, m))(tc, mdt_)
    ns = jax.vmap(fns.update)(tc, h)
    return tc, h, ns


jet_h_j = jax.jit(jet_h)
tc, h, _ = jet_h_j(st, pars, t_hi, mdt)
timeit("jet + determine_h + update", jet_h_j, st, pars, t_hi, mdt)

gc = tc[:, :, n_eq:].transpose(0, 2, 1)
hp = jnp.concatenate(
    [jnp.ones((B, 1), dtype),
     jnp.cumprod(jnp.broadcast_to(h[:, None], (B, order)), axis=1)], axis=1)
cs = (gc * hp[:, None, :]).reshape(B, order + 1)

iso_t = EI._make_tree_isolator(order, dtype, EI.MAX_ROOTS)


def tree_only(cs_):
    return iso_t(cs_)


tree_j = jax.jit(tree_only)
rlo, rhi, valid, fb = tree_j(cs)
print("fallback rows:", int(np.asarray(fb).sum()), "of", B, flush=True)
timeit("tree isolator (matmul+counts+top_k)", tree_j, cs)


def tree_no_topk(cs_):
    q = (cs_ @ iso_t.__closure__[0].cell_contents) if False else None
    return None


# refine alone
def refine_only(cs_, rlo_, rhi_, valid_):
    return EI._refine_roots(cs_, rlo_, rhi_, valid_)


refine_j = jax.jit(refine_only)
refine_j(cs, rlo, rhi, valid)
timeit("refine (bisect+newton+merge)", refine_j, cs, rlo, rhi, valid)

# full find_roots path incl. cond-fallback
evs = EI.build_event_step_batch(fns, tab._t_events, tab._nt_events, dtype,
                                tab._tol)
evs_j = jax.jit(evs)
evs_j(st, pars, t_hi, t_lo, mdt, cds)
timeit("full ev_step_b (again, direct)", evs_j, st, pars, t_hi, t_lo, mdt,
       cds)
