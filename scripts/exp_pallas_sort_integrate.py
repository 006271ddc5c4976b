#!/usr/bin/env python
"""Integration validation for the Pallas blocked-bitonic sort: race the
winning block config against lax.sort at the production bucket (2^25)
and check the FULL count pipeline (encode+canonical+sort+collapse) is
byte-identical and faster with UNIKMER_TPU_PALLAS_SORT=1.

Single device process, in-process watchdogs only (wedge discipline,
CLAUDE.md).  argv: [logblk] [looped(0/1)] [logn_sort] [reps]
"""

import os
import resource
import signal
import sys
import time

import numpy as np

resource.setrlimit(resource.RLIMIT_CPU, (5400, 5400))

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from unikmer_tpu.ops.pallas_sort import sort_codes_pallas


class Watchdog:
    def __init__(self, seconds, label):
        self.seconds, self.label = seconds, label

    def __enter__(self):
        def on_alarm(signum, frame):
            raise TimeoutError(f"{self.label}: no progress in {self.seconds}s")

        self.old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self.old)
        return False


def fetch_checksum(x):
    w = jnp.arange(1, x.shape[0] + 1, dtype=jnp.uint64)
    return int(np.asarray(jnp.sum(x * w)))


def np_checksum(x):
    w = np.arange(1, len(x) + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return int(np.sum(x * w, dtype=np.uint64))


def main():
    logblk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    looped = (sys.argv[2] if len(sys.argv) > 2 else "1") == "1"
    logn = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    blk = 1 << logblk

    with Watchdog(1200, "backend init"):
        print(f"devices: {jax.devices()}", flush=True)
    for attempt in range(20):
        try:
            with Watchdog(45, "tiny probe"):
                assert float(np.asarray(jax.device_put(np.ones(4, np.float32)))[0]) == 1.0
            break
        except TimeoutError:
            print(f"probe {attempt+1}/20 timed out; sleeping 90s", flush=True)
            time.sleep(90)
    else:
        print("device unresponsive", flush=True)
        return 1
    print("probe ok", flush=True)

    rng = np.random.default_rng(7)
    n = 1 << logn
    a = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    want = np.sort(a)
    d = jax.device_put(jnp.asarray(a))

    def race(f, label, budget=1200):
        with Watchdog(budget, label):
            t0 = time.time()
            cs = fetch_checksum(f(d))
            print(f"{label} cold {time.time()-t0:.1f}s", flush=True)
            assert cs == np_checksum(want), f"{label} CHECKSUM MISMATCH"
            best = 1e9
            for i in range(reps):
                t0 = time.time()
                fetch_checksum(f(d))
                best = min(best, time.time() - t0)
            print(f"{label} warm best {best*1e3:.1f} ms", flush=True)
        return best

    interp = jax.default_backend() == "cpu"  # CPU smoke runs only
    bx = race(jax.jit(jax.lax.sort), f"lax.sort 2^{logn}")
    bp = race(
        jax.jit(lambda x: sort_codes_pallas(x, block_elems=blk,
                                            looped=looped,
                                            interpret=interp)),
        f"pallas l{logblk} 2^{logn}",
    )
    print(f"SORT RESULT: lax {bx*1e3:.1f} ms | pallas {bp*1e3:.1f} ms "
          f"({bx/bp:.2f}x)", flush=True)

    # full pipeline parity + timing: count_step with and without the env
    from unikmer_tpu.models.count import CountConfig, count_step

    bases = rng.integers(0, 4, size=1 << 25, dtype=np.uint8)
    cfg = CountConfig(k=23, canonical=True)
    db = jax.device_put(bases)

    def run_pipeline(tag):
        f = jax.jit(lambda b: count_step(b, cfg))
        with Watchdog(1200, f"pipeline {tag}"):
            t0 = time.time()
            out, cnt = f(db)
            cs = fetch_checksum(out)
            nn = int(np.asarray(cnt))
            print(f"pipeline {tag} cold {time.time()-t0:.1f}s n={nn}",
                  flush=True)
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                out, cnt = f(db)
                cs2 = fetch_checksum(out)
                best = min(best, time.time() - t0)
                assert cs2 == cs
        return cs, nn, best

    os.environ.pop("UNIKMER_TPU_PALLAS_SORT", None)
    cs0, n0, t_base = run_pipeline("lax")
    # count_step is itself @jax.jit: the env flip below only takes
    # effect on a retrace, so drop every cached trace first (the
    # persistent XLA compile cache makes the recompiles cheap).
    jax.clear_caches()
    os.environ["UNIKMER_TPU_PALLAS_SORT"] = "1"
    os.environ["UNIKMER_TPU_PALLAS_SORT_BLOCK"] = str(blk)
    os.environ["UNIKMER_TPU_PALLAS_SORT_LOOPED"] = "1" if looped else "0"
    cs1, n1, t_pal = run_pipeline(f"pallas l{logblk}")
    same = (cs0 == cs1) and (n0 == n1)
    print(f"PIPELINE RESULT: identical={same} lax {t_base*1e3:.1f} ms | "
          f"pallas {t_pal*1e3:.1f} ms ({t_base/t_pal:.2f}x) "
          f"[{(1<<25)/t_pal/1e6:.0f}M kmers/s]", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
