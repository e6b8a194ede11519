"""Disk cache of serialized XLA executables (AOT).

Measured in round 5 (PERF.md, "GAT one-shot first_run_s";
tools/experiments/gat_aot_probe.py): on the tunnelled TPU frontend a
``deserialize_and_load``-ed executable still pays the server-side
per-process program load at first execution, but it skips the client
lower+compile entirely — 14.2 s for the GAT chunk program with a warm
persistent compile cache vs 0.17 s to deserialize the 13.6 MB blob.
Caching executables on disk therefore removes about half of the
quiet-window one-shot wall clock of the big fold-parallel chunk
programs (the reference's own usage pattern is one-shot CV runs,
ref: unet-transformer.py:478-541).

The cache is an accelerator, never a correctness dependency: any
failure (jax version skew, corrupt blob, backend mismatch, an
executable the backend refuses to serialize) falls back silently to
the plain ``jax.jit`` path. Keys include the jax version, the target
platform/device kind, a caller tag (config repr), and every argument
leaf's shape+dtype, so a stale blob can never be loaded for the wrong
program. Opt out with ``FCSR_AOT_CACHE=0``; redirect the directory
with ``FCSR_AOT_DIR``.
"""
from __future__ import annotations

import hashlib
import os
import pickle


def cache_dir() -> str:
    d = os.environ.get("FCSR_AOT_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "fcsr_jax", "aot")
    os.makedirs(d, exist_ok=True)
    return d


def enabled() -> bool:
    flag = os.environ.get("FCSR_AOT_CACHE")
    if flag is not None:
        return flag != "0"
    # default: on for the TPU backend only — the ~14 s client compile
    # it removes is a tunnelled-frontend cost; CPU (tests) keeps the
    # plain jit path unless explicitly opted in
    import jax
    return jax.default_backend() == "tpu"


def _shape_sig(args) -> str:
    import jax
    parts = []
    for leaf in jax.tree_util.tree_leaves(args):
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        parts.append(f"{shape}:{dtype}")
    return ";".join(parts)


def _blob_path(tag: str, args) -> str:
    import jax
    dev = jax.devices()[0]
    ident = "|".join([
        tag, jax.__version__,
        f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        _shape_sig(args),
    ])
    h = hashlib.sha256(ident.encode()).hexdigest()[:24]
    stem = "".join(c if c.isalnum() or c in "-_" else "_"
                   for c in tag.split("|", 1)[0])[:40]
    return os.path.join(cache_dir(), f"{stem}-{h}.bin")


def load_or_compile(tag: str, jit_fn, *args):
    """Executable for ``jit_fn`` at ``args``' shapes, via the AOT disk
    cache. Hit: ``deserialize_and_load`` (no trace/lower/compile).
    Miss: lower+compile once (the persistent XLA cache still serves the
    HLO->binary step) and serialize the executable for the NEXT
    process. Any failure returns ``jit_fn`` itself — callers just call
    whatever comes back.
    """
    if not enabled():
        return jit_fn
    try:
        import jax
        from jax.experimental import serialize_executable as se
        path = _blob_path(tag, args)
        if os.path.exists(path):
            try:
                with open(path, "rb") as fh:
                    blob, in_tree, out_tree, n_dev = pickle.load(fh)
                # deserialize_and_load defaults to ALL local devices;
                # the executable was compiled for n_dev (1 on the
                # single-chip paths) — pin them or execution fails on
                # multi-device hosts (the 8-device CPU test mesh)
                return se.deserialize_and_load(
                    blob, in_tree, out_tree,
                    execution_devices=jax.devices()[:n_dev])
            except Exception:
                # unreadable/stale blob: drop it and recompile below
                try:
                    os.remove(path)
                except OSError:
                    pass
        compiled = jit_fn.lower(*args).compile()
        try:
            n_dev = len(compiled.runtime_executable().local_devices())
        except Exception:
            n_dev = 1
        blob, in_tree, out_tree = se.serialize(compiled)
        # per-writer tmp name: two processes cold-starting together
        # must not install each other's half-written blob
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((blob, in_tree, out_tree, n_dev), fh)
        os.replace(tmp, path)
        return compiled
    except Exception:
        if os.environ.get("FCSR_AOT_DEBUG"):
            import traceback
            traceback.print_exc()
        return jit_fn


class AOTCachedJit:
    """Callable wrapper around a ``jax.jit`` function that routes each
    distinct argument-shape signature through :func:`load_or_compile`
    (one executable per signature — chunked training loops call the
    same program at a ragged final chunk size). Per-call overhead is
    one tree-leaves walk over the args; executables are memoized
    in-process.
    """

    def __init__(self, tag: str, jit_fn):
        self._tag = tag
        self._jit_fn = jit_fn
        self._by_sig: dict = {}

    def __call__(self, *args):
        sig = _shape_sig(args)
        fn = self._by_sig.get(sig)
        if fn is None:
            fn = load_or_compile(self._tag, self._jit_fn, *args)
            if fn is not self._jit_fn:
                # first call of a cached executable: if this process
                # cannot execute it (device-topology or runtime skew
                # the key missed — XLA:CPU's AOT loader rejects its own
                # host's executables), drop the blob and pin the plain
                # jit. block_until_ready: the failure can surface
                # asynchronously, and only this first call may convert
                # it into a fallback instead of a crash
                try:
                    import jax
                    out = jax.block_until_ready(fn(*args))
                except Exception:
                    try:
                        os.remove(_blob_path(self._tag, args))
                    except OSError:
                        pass
                    fn = self._jit_fn
                    out = fn(*args)
                self._by_sig[sig] = fn
                return out
            self._by_sig[sig] = fn
        return fn(*args)


def wrap(tag: str, jit_fn):
    """``jit_fn`` unchanged when the cache is disabled, else an
    :class:`AOTCachedJit` over it."""
    return AOTCachedJit(tag, jit_fn) if enabled() else jit_fn


def callable_id(fn) -> str:
    """Stable, address-free identity for a callable, for cache tags:
    module.qualname plus a bytecode hash (two different lambdas both
    repr as '<lambda>'; colliding them would load the WRONG program, so
    the code object disambiguates)."""
    name = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', repr(type(fn)))}"
    code = getattr(fn, "__code__", None)
    if code is not None:
        name += "+" + hashlib.sha256(code.co_code).hexdigest()[:8]
    return name
