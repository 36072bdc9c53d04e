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

import os
import pickle

__all__ = [
    "save", "load", "dumps", "loads",
    "enable_compilation_cache",
    "cache_path", "cache_size", "cache_entries",
    "get_cache_limit", "set_cache_limit",
    "trim_cache", "clear_cache", "pack_cache", "unpack_cache",
]


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


# ---------------------------------------------------------------------------
# Compiled-code cache lifecycle
#
# The reference treats compiled-code caching as a *managed* subsystem: an
# in-memory LRU with a size cap plus an on-disk cache with a default 20 GB
# cap and env-var relocation (src/llvm_state_cache.cpp:52-145, 322-343).
# The TPU-native analog is jax's persistent compilation cache (which stores
# the full serialized executable, Mosaic kernels included); the management
# layer below adds what jax does not: a byte-size cap with LRU eviction,
# relocation via HEYOKA_TPU_CACHE_DIR, introspection, and pack/unpack for
# pre-seeding a cold machine from a saved artifact.

_DEFAULT_CACHE_LIMIT = 20 * 1024**3  # reference default: 20 GB (:84-86)
_cache_dir: str | None = None
_cache_limit: int = _DEFAULT_CACHE_LIMIT


def _default_cache_dir() -> str:
    # relocation order mirrors the reference (llvm_state_cache.cpp:322-343):
    # explicit env var, then XDG_CACHE_HOME, then HOME
    env = os.environ.get("HEYOKA_TPU_CACHE_DIR")
    if env:
        return env
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "heyoka_tpu", "jax_cache",
    )


def enable_compilation_cache(path: str | None = None,
                             max_size: int | None = None) -> str:
    """Enable jax's persistent compilation cache (the analog of the
    reference's on-disk JIT object cache, ``src/llvm_state_cache.cpp``):
    compiled integrators reload without recompilation across processes.

    ``path`` defaults to ``$HEYOKA_TPU_CACHE_DIR`` or
    ``$XDG_CACHE_HOME/heyoka_tpu/jax_cache``.  ``max_size`` (bytes) caps the
    on-disk footprint — least-recently-used entries beyond it are evicted
    here at enable time and by :func:`trim_cache`; default 20 GB (the
    reference's default disk-cache cap).  Returns the cache directory."""
    global _cache_dir, _cache_limit
    import jax

    if path is None:
        path = _default_cache_dir()
    if max_size is not None:
        _cache_limit = int(max_size)
    _cache_dir = path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    trim_cache()
    return path


def cache_path() -> str | None:
    """The active persistent-cache directory (None before
    :func:`enable_compilation_cache`)."""
    return _cache_dir


def _entries(path):
    out = []
    try:
        names = os.listdir(path)
    except OSError:
        return out
    for n in names:
        p = os.path.join(path, n)
        try:
            st = os.stat(p)
        except OSError:
            continue
        if os.path.isfile(p):
            # LRU key: best-effort last *use* (atime when the filesystem
            # tracks it, else mtime — the reference keys its LRU on lookup
            # order, llvm_state_cache.cpp:100-145)
            out.append((max(st.st_atime, st.st_mtime), st.st_size, p))
    return out


def cache_entries() -> list:
    """(last_use_ts, size_bytes, path) per cache entry, LRU first."""
    path = _cache_dir or _default_cache_dir()
    return sorted(_entries(path))


def cache_size() -> int:
    """Total on-disk cache footprint in bytes."""
    return sum(sz for _, sz, _ in cache_entries())


def get_cache_limit() -> int:
    return _cache_limit


def set_cache_limit(nbytes: int) -> None:
    """Set the on-disk cache cap (bytes) and trim immediately — the analog
    of the reference's ``llvm_state::set_memcache_limit``."""
    global _cache_limit
    _cache_limit = int(nbytes)
    trim_cache()


def trim_cache(limit: int | None = None) -> int:
    """Evict least-recently-used cache entries until the footprint is under
    ``limit`` (default: the configured cap).  Returns bytes evicted."""
    limit = _cache_limit if limit is None else int(limit)
    ents = cache_entries()
    total = sum(sz for _, sz, _ in ents)
    evicted = 0
    for _, sz, p in ents:
        if total <= limit:
            break
        try:
            os.remove(p)
        except OSError:
            continue
        total -= sz
        evicted += sz
    return evicted


def clear_cache() -> int:
    """Remove every cache entry; returns bytes removed."""
    return trim_cache(0)


def pack_cache(archive: str) -> int:
    """Pack the cache directory into a ``.tar.gz`` artifact so a cold
    machine (same jax/runtime stack) can be pre-seeded without paying the
    multi-minute TPU kernel compiles.  Returns the number of entries."""
    import tarfile

    path = _cache_dir or _default_cache_dir()
    ents = cache_entries()
    with tarfile.open(archive, "w:gz") as tf:
        for _, _, p in ents:
            tf.add(p, arcname=os.path.basename(p))
    return len(ents)


def unpack_cache(archive: str, path: str | None = None) -> int:
    """Unpack a :func:`pack_cache` artifact into the cache directory
    (existing entries are kept; archive entries overwrite same-key files).
    Returns the number of entries restored."""
    import tarfile

    dest = path or _cache_dir or _default_cache_dir()
    os.makedirs(dest, exist_ok=True)
    n = 0
    with tarfile.open(archive, "r:gz") as tf:
        for m in tf.getmembers():
            if not m.isfile() or os.path.sep in m.name or m.name.startswith("."):
                continue
            try:
                tf.extract(m, dest, filter="data")
            except TypeError:  # Python < 3.12: no filter kwarg
                tf.extract(m, dest)
            n += 1
    return n
