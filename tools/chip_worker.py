#!/usr/bin/env python
"""Single-claim TPU job worker.

The axon pool grants a chip to a process at its FIRST computation, and the
grant queue can run 6-10+ minutes under congestion (docs/PERF_NOTES.md
round 4 — measured 16 s to >585 s for the same trivial op). Running each
chip task as its own process (tools/chip_session.sh) pays that queue per
stage; this worker pays it ONCE and then executes submitted job files
in-process for its whole lifetime.

Usage:
    python tools/chip_worker.py [jobdir]        # default /tmp/chip_jobs
Submit work by writing python files into jobdir: they run (exec) in FIFO
filename order in the worker's interpreter, stdout+stderr captured to
<job>.log, completion marked by <job>.done (first line: OK or FAIL).
Drop a file named STOP to shut the worker down. Jobs share the worker's
globals-free namespace but may import anything; the repo root is on
sys.path and the persistent XLA cache points at the repo's .xla_cache so
every compile a job triggers also pre-warms the driver's bench run.

Kill only by PID (echo $! > pid; kill $(cat pid)) — never by pattern.
"""

import contextlib
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def log(msg):
    print(f"[worker {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    jobdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_jobs"
    os.makedirs(jobdir, exist_ok=True)
    t0 = time.time()
    dev = jax.devices()[0]
    log(f"claimed {dev} in {time.time() - t0:.1f}s; paying grant queue...")
    t1 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1.0)(jnp.zeros(8, jnp.float32))))
    log(f"grant obtained in {time.time() - t1:.1f}s — ready for jobs")

    # ADVICE r4: seed from existing .done markers so a worker restart does
    # not re-run previously completed (side-effectful) jobs.
    done = {f[:-len(".done")] for f in os.listdir(jobdir)
            if f.endswith(".done")}
    if done:
        log(f"skipping {len(done)} already-done job(s)")

    def settled(f):
        # skip files still being written (non-atomic submission): require
        # the mtime to be >=2 s old. Atomic submitters (.tmp + os.rename)
        # are picked up immediately on the next poll regardless.
        try:
            return time.time() - os.path.getmtime(os.path.join(jobdir, f)) >= 2.0
        except OSError:
            return False

    while True:
        jobs = sorted(f for f in os.listdir(jobdir)
                      if f.endswith(".py") and f not in done and settled(f))
        stop = os.path.exists(os.path.join(jobdir, "STOP"))
        if not jobs:
            if stop:
                log("STOP — exiting")
                return
            time.sleep(2.0)
            continue
        name = jobs[0]
        path = os.path.join(jobdir, name)
        log(f"running {name}")
        t = time.time()
        ok = True
        with open(path + ".log", "w", buffering=1) as f, \
                contextlib.redirect_stdout(f), contextlib.redirect_stderr(f):
            try:
                src = open(path).read()
                exec(compile(src, path, "exec"), {"__name__": "__main__"})
            except BaseException:  # noqa: BLE001 — job isolation
                ok = False
                traceback.print_exc()
        done.add(name)
        with open(path + ".done", "w") as f:
            f.write(f"{'OK' if ok else 'FAIL'} {time.time() - t:.1f}s\n")
        log(f"{name}: {'OK' if ok else 'FAIL'} in {time.time() - t:.1f}s")


if __name__ == "__main__":
    main()
