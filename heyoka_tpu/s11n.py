"""Serialization / checkpointing.

Reference parity: heyoka serializes *everything* with Boost.Serialization —
expressions, integrators mid-propagation, compiled objects
(``include/heyoka/s11n.hpp``; SURVEY.md §2 #33, §5 checkpoint/resume).

TPU-native design: all runtime state already lives in plain arrays/pytrees,
so checkpointing is pickling: expressions are immutable hashable Python
objects; integrators implement ``__getstate__``/``__setstate__`` that persist
the symbolic system + configuration + dynamic state and rebuild the compiled
drivers lazily on load (the analog of the reference's object-code snapshot
reload is jax's persistent compilation cache — see
:func:`enable_compilation_cache`).  Dataset-backed expressions (EOP/SW
interpolants) re-register their ops on first use after load via the
registry's resolver hook; builtin datasets rehydrate automatically.
"""

from __future__ import annotations

import pickle

__all__ = ["save", "load", "dumps", "loads", "enable_compilation_cache"]


def save(obj, file) -> None:
    """Pickle ``obj`` (integrator, cfunc, expression, dataset, ...) to a
    file object or path."""
    if isinstance(file, (str, bytes)):
        with open(file, "wb") as f:
            pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
    else:
        pickle.dump(obj, file, protocol=pickle.HIGHEST_PROTOCOL)


def load(file):
    if isinstance(file, (str, bytes)):
        with open(file, "rb") as f:
            return pickle.load(f)
    return pickle.load(file)


def dumps(obj) -> bytes:
    return pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)


def loads(data: bytes):
    return pickle.loads(data)


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable jax's persistent compilation cache (the analog of the
    reference's on-disk JIT object cache, ``src/llvm_state_cache.cpp``):
    compiled integrators reload without recompilation across processes."""
    import jax

    if path is None:
        import os

        path = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "heyoka_tpu", "jax_cache",
        )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
