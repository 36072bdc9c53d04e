"""Compiled-code cache lifecycle management (s11n module).

Reference parity: heyoka manages its compiled-code caches as a subsystem —
in-memory LRU with a size cap plus an on-disk cache with a 20 GB default cap
and env-var relocation (src/llvm_state_cache.cpp:52-145, 322-343).  These
tests exercise the rebuild's analog over jax's persistent compilation cache:
size accounting, LRU-ordered trim to a byte cap, clear, and the
pack/unpack pre-seeding artifacts.
"""

import os
import time

import pytest

from heyoka_tpu import s11n


@pytest.fixture
def fake_cache(tmp_path, monkeypatch):
    d = tmp_path / "jc"
    d.mkdir()
    # three entries, oldest first; mtimes spaced so LRU order is stable
    now = time.time()
    for i, (name, size) in enumerate(
        [("jit_a-1-cache", 100), ("jit_b-2-cache", 200), ("jit_c-3-cache", 300)]
    ):
        p = d / name
        p.write_bytes(b"x" * size)
        os.utime(p, (now - 300 + i * 100, now - 300 + i * 100))
    monkeypatch.setattr(s11n, "_cache_dir", str(d))
    monkeypatch.setattr(s11n, "_cache_limit", s11n._DEFAULT_CACHE_LIMIT)
    return d


def test_cache_size_and_entries(fake_cache):
    assert s11n.cache_size() == 600
    ents = s11n.cache_entries()
    assert [os.path.basename(p) for _, _, p in ents] == [
        "jit_a-1-cache", "jit_b-2-cache", "jit_c-3-cache"
    ]  # LRU first


def test_trim_evicts_lru_first(fake_cache):
    evicted = s11n.trim_cache(450)
    # evicting the two oldest (100+200) brings 600 -> 300 <= 450; one
    # eviction (oldest, 100) brings it to 500 > 450, so two go
    assert evicted == 300
    left = sorted(os.listdir(fake_cache))
    assert left == ["jit_c-3-cache"]


def test_set_cache_limit_trims(fake_cache):
    s11n.set_cache_limit(550)
    assert s11n.get_cache_limit() == 550
    assert s11n.cache_size() <= 550
    assert sorted(os.listdir(fake_cache)) == ["jit_b-2-cache", "jit_c-3-cache"]


def test_clear_cache(fake_cache):
    assert s11n.clear_cache() == 600
    assert os.listdir(fake_cache) == []


def test_pack_unpack_roundtrip(fake_cache, tmp_path):
    art = str(tmp_path / "seed.tar.gz")
    assert s11n.pack_cache(art) == 3
    dest = tmp_path / "cold"
    n = s11n.unpack_cache(art, str(dest))
    assert n == 3
    assert sorted(os.listdir(dest)) == sorted(os.listdir(fake_cache))
    assert (dest / "jit_c-3-cache").stat().st_size == 300


def test_default_dir_env_relocation(monkeypatch, tmp_path):
    monkeypatch.setenv("HEYOKA_TPU_CACHE_DIR", str(tmp_path / "reloc"))
    assert s11n._default_cache_dir() == str(tmp_path / "reloc")
    monkeypatch.delenv("HEYOKA_TPU_CACHE_DIR")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    assert s11n._default_cache_dir() == str(
        tmp_path / "xdg" / "heyoka_tpu" / "jax_cache"
    )
