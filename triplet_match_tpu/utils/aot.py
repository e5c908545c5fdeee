"""Disk cache of compiled XLA executables (true AOT warm start).

The reference starts searching the moment a model is loaded — its hot path
is precompiled C++/OpenCL (``impl/scene.hpp:146-166``); there is no warmup
cliff.  Under JAX the first search in a fresh process pays tracing plus
backend compilation, and on this deployment the backend compile rides a
remote compile service with *erratic* latency (identical programs observed
30 s-15 min; the persistent HLO-level cache does not reliably absorb it —
scripts/profile_first_search.py measured a warm-cache ``compile_model`` at
157 s that had taken 8 s minutes earlier).

The robust fix is to persist the compiled *executable* itself:
``jax.experimental.serialize_executable`` pickles the loaded PJRT
executable, and deserializing is a local file read (~40 ms measured through
the same tunnel).  Entries are keyed by everything that shapes the program:

  - package source hash (any code edit invalidates the whole cache),
  - jax version, backend platform + device kind,
  - the abstract signature (shape/dtype/weak-type) of every argument,
  - the repr of the static configuration (frozen dataclasses).

Stale entries are therefore impossible by construction; the cache
directory is bounded by an LRU file sweep.  Any failure to load or store
falls back silently to the normal jit path — AOT is an accelerator, never
a correctness dependency.

Two-level keying (round 5): the source-hash key above is cheap (no
tracing) but over-invalidates — editing a comment, a script, or an
unrelated module re-pays the remote-compile lottery for every program.
Executable blobs are therefore stored under a *program key* (hash of the
lowered StableHLO text + backend + jax version — the program fully
determines the executable), and the cheap source-hash key becomes a tiny
``.alias`` file pointing at it.  A fresh process with unchanged source
resolves blob through the alias without tracing; after a code edit the
alias misses, the program is re-lowered (seconds), and if the traced
program is unchanged the blob still HITS on the program key — only a real
program change recompiles.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

_CACHE_ENV = "TMTPU_AOT_CACHE"
_DISABLE_ENV = "TMTPU_AOT_DISABLE"
_LEGACY_DIR = "/tmp/tmtpu_aot_cache"
_MAX_ENTRIES = 64  # LRU sweep bound (executables are MBs, not GBs)

_SRC_HASH: str | None = None
_MEM: dict = {}  # key -> loaded Compiled (per-process; unbounded is fine, see LRU note)
_MEM_MAX = 16
_WARNED = False


def enabled() -> bool:
    """AOT executable caching is TPU-only.

    XLA:CPU AOT blobs encode host machine features and loading one compiled
    elsewhere (or under different feature detection) SIGILLs/segfaults —
    measured in this environment: a blob stored and reloaded on the SAME
    host crashed the process.  The TPU (PJRT) path round-trips cleanly
    (~40 ms load through the remote tunnel).  ``TMTPU_AOT_FORCE=1``
    overrides the platform gate (tests monkeypatch the serializer).
    """
    if os.environ.get(_DISABLE_ENV):
        return False
    if os.environ.get("TMTPU_AOT_FORCE"):
        return True
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def cache_dir() -> str:
    """Cache directory: ``$TMTPU_AOT_CACHE``, else a per-uid /tmp path.

    Entries are loaded with ``pickle`` (that is the
    ``serialize_executable`` wire format), so on a multi-user host the
    directory must not be attacker-creatable: the default is suffixed
    with the uid, and :func:`_dir_is_trusted` refuses directories owned
    by someone else.  The un-suffixed legacy path is honored only when
    it already exists and is ours (keeps existing warm caches valid).
    """
    env = os.environ.get(_CACHE_ENV)
    if env:
        return env
    try:
        st = os.stat(_LEGACY_DIR)
        if st.st_uid == os.getuid():
            return _LEGACY_DIR
    except OSError:
        pass
    return f"{_LEGACY_DIR}_{os.getuid()}"


def _dir_is_trusted(path: str) -> bool:
    """True iff ``path`` is owned by us and not group/other-writable."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    return st.st_uid == os.getuid() and not (st.st_mode & 0o022)


def _source_hash() -> str:
    """Hash of every .py in the package: code edits invalidate the cache."""
    global _SRC_HASH
    if _SRC_HASH is None:
        import triplet_match_tpu

        root = os.path.dirname(os.path.abspath(triplet_match_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, files in os.walk(root):
            # prune BEFORE the walk descends (mutating dirnames after
            # sorted() exhausted the generator would do nothing), and sort
            # in place so the hash is traversal-order stable
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(files):
                if fn.endswith(".py"):
                    h.update(fn.encode())
                    with open(os.path.join(dirpath, fn), "rb") as fh:
                        h.update(fh.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _abstract_sig(args) -> str:
    """Abstract signature string for a pytree of arguments."""
    import jax
    from jax.api_util import shaped_abstractify

    leaves, treedef = jax.tree_util.tree_flatten(args)
    avals = ",".join(str(shaped_abstractify(x)) for x in leaves)
    return f"{treedef}|{avals}"


def cache_key(tag: str, args, statics: str) -> str:
    """Content key for one (program, signature, config) combination."""
    import jax

    dev = jax.devices()[0]
    parts = "\x00".join([
        tag,
        _source_hash(),
        jax.__version__,
        dev.platform,
        getattr(dev, "device_kind", "?"),
        _abstract_sig(args),
        statics,
    ])
    return hashlib.sha256(parts.encode()).hexdigest()[:32]


def program_key(tag: str, lowered) -> str:
    """Key on the lowered program itself: StableHLO text + backend + jax
    version.  The compile options are the repo-wide defaults everywhere, so
    the lowered program determines the executable."""
    import jax

    dev = jax.devices()[0]
    h = hashlib.sha256()
    h.update("\x00".join([
        tag,
        jax.__version__,
        dev.platform,
        getattr(dev, "device_kind", "?"),
    ]).encode())
    h.update(lowered.as_text().encode())
    return "p" + h.hexdigest()[:31]


def _path(key: str) -> str:
    return os.path.join(cache_dir(), f"{key}.jaxexec")


def _alias_path(key: str) -> str:
    return os.path.join(cache_dir(), f"{key}.alias")


def _write_alias(key: str, target: str) -> None:
    """Best-effort atomic publish of the cheap-key -> program-key alias."""
    try:
        os.makedirs(cache_dir(), mode=0o700, exist_ok=True)
        if not _dir_is_trusted(cache_dir()):
            return
        fd, tmp = tempfile.mkstemp(dir=cache_dir(), suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                fh.write(target)
            os.replace(tmp, _alias_path(key))
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    except Exception:
        pass


def _read_alias(key: str) -> str | None:
    try:
        with open(_alias_path(key)) as fh:
            target = fh.read().strip()
    except OSError:
        return None
    # an alias target is a key we wrote: hex with an optional 'p' prefix
    if target and target != key and len(target) <= 64 \
            and all(c in "0123456789abcdefp" for c in target):
        return target
    return None


def _warn_once(msg: str) -> None:
    global _WARNED
    if not _WARNED:
        import warnings

        warnings.warn(f"tmtpu AOT executable cache: {msg} (falling back to jit)")
        _WARNED = True


def load(key: str):
    """Return the loaded Compiled for ``key``, or None."""
    if not enabled():
        return None
    hit = _MEM.pop(key, None)
    if hit is not None:
        _MEM[key] = hit  # refresh LRU position
        return hit
    path = _path(key)
    if not _dir_is_trusted(cache_dir()):
        return None  # never unpickle from a directory someone else owns
    try:
        with open(path, "rb") as fh:
            blob, in_tree, out_tree = pickle.load(fh)
        from jax.experimental import serialize_executable as se

        compiled = se.deserialize_and_load(blob, in_tree, out_tree)
        os.utime(path)  # LRU touch
        _remember(key, compiled)
        return compiled
    except FileNotFoundError:
        # no blob under this key: a cheap (source-hash) key may alias the
        # program-key blob written by an earlier source revision
        target = _read_alias(key)
        if target is not None:
            hit = load(target)
            if hit is not None:
                _remember(key, hit)  # both keys warm in memory
            return hit
        return None
    except Exception as e:  # stale format / backend mismatch / pickle issues
        _warn_once(f"load failed: {e!r}")
        try:
            os.unlink(path)
        except OSError:
            pass
        return None


def store(key: str, compiled) -> None:
    """Best-effort persist of a jax.stages.Compiled."""
    if not enabled():
        return
    _remember(key, compiled)
    try:
        from jax.experimental import serialize_executable as se

        blob, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(cache_dir(), mode=0o700, exist_ok=True)
        if not _dir_is_trusted(cache_dir()):
            _warn_once("cache dir not owned by this user; refusing to store")
            return
        path = _path(key)
        fd, tmp = tempfile.mkstemp(dir=cache_dir(), suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as fh:
                pickle.dump((blob, in_tree, out_tree), fh)
            os.replace(tmp, path)  # atomic publish
        except BaseException:
            # don't leak multi-MB .tmp blobs (the LRU sweep only sees
            # *.jaxexec) when the dump dies mid-write (disk full, etc.)
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        _sweep()
    except Exception as e:  # const_args, unsupported backend, disk errors
        _warn_once(f"store failed: {e!r}")


def _remember(key: str, compiled) -> None:
    _MEM.pop(key, None)
    _MEM[key] = compiled
    while len(_MEM) > _MEM_MAX:
        _MEM.pop(next(iter(_MEM)))


def _sweep() -> None:
    """Bound the cache directory to _MAX_ENTRIES files (oldest-mtime out)."""
    try:
        entries = [
            (os.path.getmtime(p), p)
            for p in (
                os.path.join(cache_dir(), f)
                for f in os.listdir(cache_dir())
                if f.endswith(".jaxexec")
            )
        ]
        entries.sort()
        for _, p in entries[:-_MAX_ENTRIES]:
            os.unlink(p)
        # drop aliases whose target blob was swept (or never landed)
        for f in os.listdir(cache_dir()):
            if not f.endswith(".alias"):
                continue
            p = os.path.join(cache_dir(), f)
            target = _read_alias(f[:-len(".alias")])
            if target is None or not os.path.exists(_path(target)):
                try:
                    os.unlink(p)
                except OSError:
                    pass
    except OSError:
        pass


def get_or_compile(tag: str, jitted, args, statics: str):
    """Resolve ``jitted`` for ``args``' signature through the AOT cache.

    Returns something callable with exactly ``args``-shaped arguments: the
    deserialized executable on a hit, or the freshly compiled one (stored
    for next time) on a miss.  Returns ``jitted`` itself if AOT is disabled
    or anything fails — callers never need a fallback path of their own.
    """
    if not enabled():
        return jitted
    try:
        key = cache_key(tag, args, statics)
    except Exception as e:
        _warn_once(f"keying failed: {e!r}")
        return jitted
    compiled = load(key)
    if compiled is not None:
        return compiled
    try:
        lowered = jitted.lower(*args)
    except Exception as e:
        _warn_once(f"explicit lower failed: {e!r}")
        return jitted
    # cheap key missed (usually: source edited) — the lowered program may
    # still match a stored blob from before the edit
    try:
        pkey = program_key(tag, lowered)
    except Exception as e:
        _warn_once(f"program keying failed: {e!r}")
        pkey = None
    if pkey is not None:
        compiled = load(pkey)
        if compiled is not None:
            _write_alias(key, pkey)  # next fresh process skips the lowering
            _remember(key, compiled)
            return compiled
    try:
        compiled = lowered.compile()
    except Exception as e:
        _warn_once(f"explicit compile failed: {e!r}")
        return jitted
    if pkey is not None:
        store(pkey, compiled)
        _write_alias(key, pkey)
        _remember(key, compiled)
    else:
        store(key, compiled)
    return compiled


def clear_memory_cache() -> None:
    """Drop in-process loaded executables (tests; frees device programs)."""
    _MEM.clear()
