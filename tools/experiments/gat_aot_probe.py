#!/usr/bin/env python
"""Does AOT executable serialization skip the tunnelled server's
per-process program LOAD for the real GAT chunk program?

The GAT one-shot first_run_s floor (~27 s in quiet windows, PERF.md
"GAT one-shot first_run_s") is dominated by the server-side
per-process load of the chunk program — paid at FIRST EXECUTION, not
at client compile (the persistent compile cache already makes the
client side a ~10 s deserialize).  jax.experimental.serialize_executable
round-trips executables on this backend (verified on a toy program);
this experiment answers whether a DESERIALIZED big program still pays
the server load.

Protocol (each phase a fresh process; run in this order):

    python tools/experiments/gat_aot_probe.py save     # compile+serialize
    python tools/experiments/gat_aot_probe.py load     # deserialize, time exec
    python tools/experiments/gat_aot_probe.py control  # normal jit, time exec

All phases drive ``run_gat_cv_fast`` (production config, 3-fold x
100 ep, fused whole-step, shipped unroll) up to the first chunk-program
invocation and capture its EXACT argument pytree by swapping a recorder
into the cached program namespace — so the timed executable and
operands are the production ones, not a mock.  Compare ``first_exec``
between load and control: equal => the load is per-process on the
server and AOT buys nothing (measured rejection); load << control =>
wiring an executable disk cache into gat_loop drops first_run_s toward
the ~12 s client-side floor.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fcsr_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402

BLOB = os.environ.get("FCSR_AOT_BLOB", "/tmp/gat_chunk_aot.bin")


class _Captured(Exception):
    pass


def capture_chunk_call():
    """Drive the production pipeline to the first chunk invocation and
    return (progs, real_chunk_jit, args) without executing it."""
    from fcsr_tpu.data import load_or_synthesize
    import fcsr_tpu.train.gat_loop as gl
    from fcsr_tpu.pipelines import run_gat_cv_fast

    t0 = time.perf_counter()
    data = load_or_synthesize("data", n_train=167, n_test=112, seed=42)
    cfg = gl.GATTrainConfig(epochs=100, fused_step=True)

    cap = {}
    orig = gl._gat_fold_programs

    def patched(cfg0, interp):
        progs = orig(cfg0, interp)
        cap["progs"], cap["real"] = progs, progs.chunk_jit

        def recorder(*args):
            cap["args"] = args
            raise _Captured

        progs.chunk_jit = recorder
        return progs

    gl._gat_fold_programs = patched
    try:
        run_gat_cv_fast(data, cfg=cfg, splits=3, seed=42)
        raise RuntimeError("chunk program was never invoked")
    except _Captured:
        pass
    finally:
        gl._gat_fold_programs = orig
        if "progs" in cap:
            cap["progs"].chunk_jit = cap["real"]
    print(f"capture (data+staging+init to first chunk call): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    return cap["real"], cap["args"]


def time_exec(fn, args, label):
    # np.asarray is the only real sync on this backend
    # (ROUND_NOTES landmine 12) — pull the small (F,) active mask
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out[0][3])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out[0][3])
    t2 = time.perf_counter() - t0
    print(f"{label}: first_exec={t1:.2f}s second_exec={t2:.2f}s",
          flush=True)


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "control"
    real, args = capture_chunk_call()

    if phase == "save":
        from jax.experimental import serialize_executable as se
        t0 = time.perf_counter()
        compiled = real.lower(*args).compile()
        print(f"lower+compile (client): {time.perf_counter() - t0:.2f}s",
              flush=True)
        blob, in_tree, out_tree = se.serialize(compiled)
        with open(BLOB, "wb") as fh:
            pickle.dump((blob, in_tree, out_tree), fh)
        print(f"serialized: {os.path.getsize(BLOB) // 1024} KB -> {BLOB}",
              flush=True)
        time_exec(compiled, args, "save-process (context)")
    elif phase == "load":
        from jax.experimental import serialize_executable as se
        t0 = time.perf_counter()
        with open(BLOB, "rb") as fh:
            blob, in_tree, out_tree = pickle.load(fh)
        compiled = se.deserialize_and_load(blob, in_tree, out_tree)
        print(f"deserialize_and_load: {time.perf_counter() - t0:.2f}s",
              flush=True)
        time_exec(compiled, args, "AOT-deserialized")
    else:
        t0 = time.perf_counter()
        compiled = real.lower(*args).compile()
        print(f"lower+compile (client, persistent cache): "
              f"{time.perf_counter() - t0:.2f}s", flush=True)
        time_exec(compiled, args, "normal-jit")


if __name__ == "__main__":
    main()
