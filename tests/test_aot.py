"""Unit tests for the AOT executable disk cache (utils/aot.py).

The real serialize/deserialize path is TPU-only (XLA:CPU AOT blobs are
machine-feature-pinned and loading one segfaulted on the very host that
wrote it — see aot.enabled).  These tests exercise the cache *mechanics*
on CPU: keying, the platform gate, the store/load flow with a
monkeypatched serializer, fallback on failure, and the LRU sweep.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import pytest

from triplet_match_tpu.utils import aot


def _patch_serializer(monkeypatch, fake):
    """Route ``from jax.experimental import serialize_executable`` to a fake.

    Patch both the parent-package attribute and sys.modules: the from-import
    resolves via whichever exists, depending on whether the real submodule
    was imported earlier in the process.
    """
    import sys

    import jax.experimental

    monkeypatch.setattr(jax.experimental, "serialize_executable", fake,
                        raising=False)
    monkeypatch.setitem(sys.modules, "jax.experimental.serialize_executable", fake)


@pytest.fixture
def aot_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("TMTPU_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("TMTPU_AOT_FORCE", "1")
    monkeypatch.delenv("TMTPU_AOT_DISABLE", raising=False)
    aot.clear_memory_cache()
    yield tmp_path
    aot.clear_memory_cache()


def test_disabled_on_cpu(monkeypatch):
    monkeypatch.delenv("TMTPU_AOT_FORCE", raising=False)
    assert jax.devices()[0].platform == "cpu"
    assert not aot.enabled()


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("TMTPU_AOT_DISABLE", "1")
    monkeypatch.setenv("TMTPU_AOT_FORCE", "1")
    assert not aot.enabled()


def test_cache_key_sensitivity(aot_dir):
    x = jnp.zeros((8, 4), jnp.float32)
    k0 = aot.cache_key("tag", (x,), "statics")
    assert k0 == aot.cache_key("tag", (jnp.ones((8, 4)),), "statics")  # values don't key
    assert k0 != aot.cache_key("other", (x,), "statics")
    assert k0 != aot.cache_key("tag", (x,), "other-statics")
    assert k0 != aot.cache_key("tag", (jnp.zeros((8, 5)),), "statics")  # shape
    assert k0 != aot.cache_key("tag", (jnp.zeros((8, 4), jnp.bfloat16),), "statics")  # dtype
    # pytree STRUCTURE keys too
    assert k0 != aot.cache_key("tag", ((x, None),), "statics")


def test_get_or_compile_roundtrip(aot_dir, monkeypatch):
    """Monkeypatched serializer: store writes, fresh-memory load reads."""
    calls = {"ser": 0, "des": 0}

    class FakeSE:
        @staticmethod
        def serialize(compiled):
            calls["ser"] += 1
            return b"blob", ("in",), ("out",)

        @staticmethod
        def deserialize_and_load(blob, in_tree, out_tree):
            calls["des"] += 1
            assert blob == b"blob"
            return jax.jit(lambda x: x + 1).lower(jnp.zeros(4)).compile()

    _patch_serializer(monkeypatch, FakeSE)

    f = jax.jit(lambda x: x * 2)
    x = jnp.arange(4.0)
    got = aot.get_or_compile("t", f, (x,), "s")
    # miss path: compiled object (not the jitted fallback), stored to disk
    assert calls["ser"] == 1
    assert any(p.endswith(".jaxexec") for p in os.listdir(aot_dir))
    assert float(got(x)[1]) == 2.0

    # warm-memory hit: no deserialization needed
    key = aot.cache_key("t", (x,), "s")
    assert aot.load(key) is not None
    assert calls["des"] == 0

    # fresh-memory (new process analog): load goes through the serializer
    aot.clear_memory_cache()
    got2 = aot.load(key)
    assert got2 is not None and calls["des"] == 1
    assert float(got2(jnp.zeros(4))[0]) == 1.0  # the fake's reloaded program


def test_program_key_survives_source_churn(aot_dir, monkeypatch):
    """A source edit invalidates the cheap key, but the same traced program
    must hit the stored blob through the program key (no re-serialize), and
    the refreshed alias must serve the next fresh process without lowering."""
    calls = {"ser": 0, "des": 0}

    class FakeSE:
        @staticmethod
        def serialize(compiled):
            calls["ser"] += 1
            return b"blob", ("in",), ("out",)

        @staticmethod
        def deserialize_and_load(blob, in_tree, out_tree):
            calls["des"] += 1
            return jax.jit(lambda x: x + 1).lower(jnp.zeros(4)).compile()

    _patch_serializer(monkeypatch, FakeSE)

    f = jax.jit(lambda x: x * 2)
    x = jnp.arange(4.0)
    aot.get_or_compile("t", f, (x,), "s")
    assert calls["ser"] == 1
    # blob lands under the program key; the cheap key is an alias to it
    assert any(p.startswith("p") and p.endswith(".jaxexec")
               for p in os.listdir(aot_dir))
    assert any(p.endswith(".alias") for p in os.listdir(aot_dir))

    # "edit the source": new source hash -> new cheap key, same program
    monkeypatch.setattr(aot, "_SRC_HASH", "deadbeefdeadbeef")
    aot.clear_memory_cache()
    got = aot.get_or_compile("t", f, (x,), "s")
    assert calls["ser"] == 1  # no recompile/store
    assert calls["des"] == 1  # loaded the existing blob via the program key
    assert float(got(jnp.zeros(4))[0]) == 1.0  # the fake's reloaded program

    # the churned cheap key now has its own alias: a fresh process resolves
    # without lowering (load alone, no get_or_compile)
    aot.clear_memory_cache()
    key2 = aot.cache_key("t", (x,), "s")
    assert aot.load(key2) is not None
    assert calls["des"] == 2


def test_sweep_drops_orphaned_aliases(aot_dir):
    with open(os.path.join(aot_dir, "pabc.jaxexec"), "wb") as fh:
        fh.write(b"x")
    with open(os.path.join(aot_dir, "aaaa.alias"), "w") as fh:
        fh.write("pabc")  # live target
    with open(os.path.join(aot_dir, "bbbb.alias"), "w") as fh:
        fh.write("pmissing")  # orphan
    aot._sweep()
    left = sorted(os.listdir(aot_dir))
    assert "aaaa.alias" in left and "bbbb.alias" not in left


def test_fallback_on_store_failure(aot_dir, monkeypatch):
    """A serializer that raises must not break the caller: jit still runs."""

    class BrokenSE:
        @staticmethod
        def serialize(compiled):
            raise ValueError("Compilation does not support serialization")

    _patch_serializer(monkeypatch, BrokenSE)
    import warnings

    f = jax.jit(lambda x: x - 1)
    x = jnp.arange(3.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = aot.get_or_compile("t2", f, (x,), "s")
    assert float(got(x)[0]) == -1.0  # compiled works even though store failed
    # in-memory cache still primed despite the disk failure
    assert aot.load(aot.cache_key("t2", (x,), "s")) is not None


def test_lru_sweep(aot_dir, monkeypatch):
    monkeypatch.setattr(aot, "_MAX_ENTRIES", 3)
    for i in range(6):
        p = os.path.join(aot_dir, f"k{i}.jaxexec")
        with open(p, "wb") as fh:
            fh.write(b"x")
        os.utime(p, (i, i))  # strictly increasing mtimes
    aot._sweep()
    left = sorted(f for f in os.listdir(aot_dir) if f.endswith(".jaxexec"))
    assert left == ["k3.jaxexec", "k4.jaxexec", "k5.jaxexec"]


def test_find_all_unaffected_on_cpu(monkeypatch):
    """With AOT gated off (CPU), find_all resolves through plain jit: the
    driver integration must not require the cache."""
    monkeypatch.delenv("TMTPU_AOT_FORCE", raising=False)
    assert not aot.enabled()
    # (the full driver path is exercised by every other test in the suite)
