"""Disk cache for finished QUANTIZED param trees.

The TPU analog of the reference shipping prebuilt TRT engines / quantized
weights (demo_utils/vae.py:317-390, release_server.py:179-182): host-side
init + calibrate + quantize of the int8 serving tiers costs ~1-2 minutes of
a cold start; a warm start loads the finished tree straight from disk and
goes to device_put.

Keys must fold in a hash of the defining module's source (``code_hash``) so
model-code changes miss automatically instead of silently loading stale
numerics (ADVICE r4). Checkpoint-derived params should additionally key on
the checkpoint's identity (``file_sig``).

Disable with RTV_QUANT_CACHE=0; entries live in RTV_QUANT_CACHE_DIR
(default: ``~``), named ``.rtv_<prefix>_<key>.pkl``.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

__all__ = ["cache_key", "code_hash", "file_sig", "cached_tree", "enabled"]


def enabled() -> bool:
    return os.getenv("RTV_QUANT_CACHE",
                     os.getenv("RTV_BENCH_CAL_CACHE", "1")) in ("1", "true")


def code_hash(module) -> str:
    """Short hash of a module's source file (stale-entry auto-miss)."""
    with open(module.__file__, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:8]


def file_sig(path: str) -> str:
    """Cheap identity for a checkpoint file/dir: path + mtime + size."""
    try:
        st = os.stat(path)
        return f"{path}:{int(st.st_mtime)}:{st.st_size}"
    except OSError:
        return f"{path}:missing"


def cache_key(*parts: Any) -> str:
    return hashlib.sha256(repr(parts).encode()).hexdigest()[:16]


def _path(prefix: str, key: str) -> str:
    base = os.path.expanduser(os.getenv("RTV_QUANT_CACHE_DIR", "~"))
    return os.path.join(base, f".rtv_{prefix}_{key}.pkl")


def cached_tree(prefix: str, key: str, build: Callable[[], Any],
                log=None) -> Any:
    """Return the cached tree for (prefix, key), building + storing on miss.

    The stored tree is converted to numpy leaves (device-independent); the
    caller device_puts it wherever it wants. ``build`` runs only on a miss.
    """
    path = _path(prefix, key)
    if enabled() and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                tree = pickle.load(f)
            if log is not None:
                log.info("quantized-param cache HIT %s", path)
            return tree
        except Exception:  # truncated/corrupt entry (killed writer) -> miss
            if log is not None:
                log.warning("quantized-param cache CORRUPT %s — rebuilding",
                            path)
            try:
                os.remove(path)
            except OSError:
                pass
    tree = build()
    if enabled():
        import numpy as np
        import jax

        def _np(x):  # non-array leaves (configs, scalars) pickle as-is
            return np.asarray(x) if isinstance(x, jax.Array) else x

        # tmp + atomic rename: a writer killed mid-dump (the unattended
        # chains run benches under `timeout`) must not leave a truncated
        # pickle under a live key
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            with open(tmp, "wb") as f:
                pickle.dump(jax.tree_util.tree_map(_np, tree), f)
            os.replace(tmp, path)
            if log is not None:
                log.info("quantized-param cache stored %s", path)
        except OSError:
            try:
                os.remove(tmp)
            except OSError:
                pass
    return tree
