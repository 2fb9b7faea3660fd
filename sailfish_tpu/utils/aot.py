"""Cross-process EXECUTABLE cache for the fused production steps.

Why this exists: on the tunneled axon TPU backend the standard jax
persistent compilation cache is write-only — entries appear on disk
but are never read back, so every process pays a full REMOTE compile
of the big fused mapping step, and that compile's wall time is tunnel
weather (measured 2026-08-20: 52.8s / 141.7s / 704.4s for the
bit-identical HLO).  Tracing + lowering are also partly remote on this
backend (Mosaic kernel serialization) and cost minutes more.

PJRT executable serialization, however, works: a compiled executable
round-trips through jax.experimental.serialize_executable in
milliseconds.  So the warm path here is: key the EXECUTABLE by
(jax version, device kind, package-source fingerprint, semantic
options, argument avals), store it next to the other caches, and on a
hit skip tracing AND compilation entirely — the step goes straight to
execution.  Measured warm start of bench.py: minutes -> seconds.

Correctness: the key covers every input that shapes the traced graph —
the whole sailfish_tpu source tree (any code edit invalidates), the
QuantOpts fields that are graph statics, the index's static parameters,
and the full arg tree avals (shapes/dtypes of reads AND index arrays).
A stale or corrupt entry deserializes into garbage only if PJRT's own
executable compatibility check passes while the graph semantics
changed — prevented by the source fingerprint.  Any failure in
load/save degrades to the normal jit path.
"""

from __future__ import annotations

import gzip
import hashlib
import logging
import os
import pickle
import tempfile

import jax

log = logging.getLogger("sailfish_tpu")

_CODE_FP = None


def _code_fingerprint() -> str:
    """Hash of every .py file in the sailfish_tpu package (sorted
    walk) — any source edit invalidates cached executables."""
    global _CODE_FP
    if _CODE_FP is not None:
        return _CODE_FP
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(p.encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    _CODE_FP = h.hexdigest()
    return _CODE_FP


def default_cache_dir() -> str:
    return os.environ.get(
        "SAILFISH_TPU_EXE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sailfish_tpu",
                     "exe"),
    )


def enabled() -> bool:
    """On by default on real accelerators; off on CPU (local compiles
    are fast and the test suite builds many tiny throwaway indexes)."""
    v = os.environ.get("SF_AOT_CACHE")
    if v is not None:
        return v not in ("0", "false", "False")
    return jax.default_backend() != "cpu"


def cache_key(tag: str, statics, args) -> str:
    """Hash of everything that shapes the compiled executable."""
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    dev = jax.devices()[0]
    h.update(f"{dev.platform}/{dev.device_kind}/{jax.device_count()}"
             .encode())
    h.update(_code_fingerprint().encode())
    h.update(tag.encode())
    h.update(repr(statics).encode())
    for leaf in jax.tree_util.tree_leaves(args):
        h.update(str(jax.api_util.shaped_abstractify(leaf)).encode())
    return h.hexdigest()[:32]


def load(tag: str, statics, args):
    """Return a ready Compiled for (tag, statics, args) or None."""
    if not enabled():
        return None
    path = os.path.join(default_cache_dir(), f"{tag}-"
                        f"{cache_key(tag, statics, args)}.pkl")
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
        )

        with gzip.open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        # the cached steps are single-device programs (the sharded
        # backend opts out); the default would load onto ALL local
        # devices and then demand 8-way-sharded args on a forced
        # multi-device host
        comp = deserialize_and_load(
            payload, in_tree, out_tree,
            execution_devices=jax.devices()[:1])
        log.info("AOT executable cache hit: %s", os.path.basename(path))
        return comp
    except Exception as e:  # stale/corrupt/incompatible -> recompile
        log.warning("AOT cache load failed (%s: %s); recompiling",
                    type(e).__name__, e)
        try:
            os.unlink(path)
        except OSError:
            pass
        return None


def compile_and_save(fn, tag: str, statics, args):
    """AOT-compile `fn` for `args` and persist the executable.
    Returns the Compiled (or None if AOT compilation itself fails —
    caller falls back to the plain jit)."""
    try:
        comp = fn.lower(*args).compile()
    except Exception as e:
        log.warning("AOT lower/compile failed (%s: %s); using plain jit",
                    type(e).__name__, e)
        return None
    if enabled():
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(comp)
            d = default_cache_dir()
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{tag}-"
                                f"{cache_key(tag, statics, args)}.pkl")
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            with os.fdopen(fd, "wb") as raw, \
                    gzip.GzipFile(fileobj=raw, mode="wb",
                                  compresslevel=1) as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
            log.info("AOT executable cached: %s (%.1f MB)",
                     os.path.basename(path),
                     os.path.getsize(path) / 1e6)
        except Exception as e:
            log.warning("AOT cache save failed (%s: %s)",
                        type(e).__name__, e)
    return comp
