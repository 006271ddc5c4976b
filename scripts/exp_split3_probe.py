"""On-chip compile probe: does the u64-free (u32,u32,i32) num_keys=2
sort compile where u64-operand sorts starve?  (ROADMAP round-4 #3.)

Success re-enables k>=24 / hashed device taxid collapses via
UNIKMER_TPU_TAXID_SORT=split3.  RUN ONLY AT SESSION END: if the
operand-type theory is wrong, the abandoned compile (alarm exit)
poisons the compile queue for follow-on sessions (BENCH_NOTES
round-3).  Gate with CHIP_PROBE_SPLIT3=1.
"""

import os
import signal
import sys
import time

ALARM_S = int(os.environ.get("SPLIT3_ALARM_S", "600"))
LOG2N = int(os.environ.get("SPLIT3_LOG2N", "23"))


def main() -> int:
    if os.environ.get("CHIP_PROBE_SPLIT3") != "1":
        print("split3 probe skipped (set CHIP_PROBE_SPLIT3=1)")
        return 0
    import numpy as np

    import unikmer_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    n = 1 << LOG2N
    rng = np.random.default_rng(5)
    hi = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    pay = rng.integers(0, 1 << 20, n, dtype=np.int64).astype(np.int32)

    @jax.jit
    def f(h, l, p):
        h2, l2, p2 = jax.lax.sort((h, l, p), num_keys=2)
        return h2[0].astype(jnp.uint64) + l2[0] + p2[0].astype(jnp.uint32)

    def on_alarm(signum, frame):
        print(f"SPLIT3 PROBE: compile starved >{ALARM_S}s at 2^{LOG2N} "
              "— u64-free 3-operand sorts ALSO poison; keep the tpu "
              "admission gate", flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(ALARM_S)
    t0 = time.time()
    v = int(np.asarray(f(jnp.asarray(hi), jnp.asarray(lo),
                         jnp.asarray(pay))))
    signal.alarm(0)
    print(f"SPLIT3 PROBE: compiled+ran in {time.time() - t0:.1f}s at "
          f"2^{LOG2N} (value {v}) — UNIKMER_TPU_TAXID_SORT=split3 is "
          "viable on this backend", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
