"""Compile probe: do NON-power-of-two big sorts compile on this
backend?  Gates UNIKMER_TPU_CAP_QUANTUM=quarter on TPU (the mesh
capacity quanta {1.25, 1.5, 1.75} x 2^i — exp_mesh_quantum measured
pow2's worst-case 1.9x padding costing ~40 points of scaling
efficiency, but only pow2 bucket sizes have chip compile evidence).

Session-end only (a starved compile wedges followers).  Gate with
CHIP_PROBE_NONPOW2=1.  Each arm: jit the production split sort at the
quarter-octave sizes around 2^23, in-process alarm per compile,
exactness via sortedness + checksum scalar fetches.
"""

import os
import signal
import sys
import time

if os.environ.get("CHIP_PROBE_NONPOW2") != "1":
    print("nonpow2 probe skipped (set CHIP_PROBE_NONPOW2=1)")
    sys.exit(0)

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from unikmer_tpu.ops.sort import _sort_u64

ALARM_S = int(os.environ.get("NONPOW2_ALARM_S", "900"))


@jax.jit
def probe(codes):
    s = _sort_u64(codes, code_bits=46)
    ok = jnp.all(s[1:] >= s[:-1])
    return ok, jnp.sum(s >> jnp.uint64(33), dtype=jnp.uint64)


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(13)
    base = 1 << 23
    for frac, label in ((4, "1.00x"), (5, "1.25x"), (6, "1.50x"),
                        (7, "1.75x")):
        n = base * frac // 4
        data = rng.integers(0, 1 << 46, n, dtype=np.uint64)
        want = np.uint64(np.sum(np.sort(data) >> np.uint64(33),
                                dtype=np.uint64))

        def on_alarm(signum, frame):
            print(f"{label} n={n}: COMPILE STARVED (> {ALARM_S}s) — "
                  "keep pow2 quanta on TPU", flush=True)
            os._exit(2)

        signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(ALARM_S)
        t0 = time.time()
        ok, chk = probe(jnp.asarray(data))
        ok = bool(np.asarray(ok))
        chk = np.uint64(np.asarray(chk))
        signal.alarm(0)
        dt = time.time() - t0
        status = "EXACT" if (ok and chk == want) else "MISMATCH"
        print(f"{label} n={n}: compiled+ran in {dt:6.1f}s  {status}",
              flush=True)
        if status != "EXACT":
            return 1
    print("nonpow2 sorts OK — quarter quanta safe to enable on TPU",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
