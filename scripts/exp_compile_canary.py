"""Compile-health canary: submit a tiny NEVER-CACHED program and see
whether the remote AOT service answers within the alarm window.

The 2026-08-20 sessions starved >60 min inside compiles of new
programs while cached programs executed fine — consistent with the
compile service serializing behind an orphaned monster compile.  This
canary distinguishes 'compiles healthy' (exit 0, proceed to phases
that need new programs) from 'compile queue poisoned' (alarm exit 2 —
callers should skip compile-needing phases; NOTE the abandoned canary
compile itself may wedge backend init for follow-on processes, so only
run this when the remaining phases would need compiles anyway).
"""

import os
import signal
import sys
import time

ALARM_S = int(os.environ.get("CANARY_ALARM_S", "360"))


def main() -> int:
    import numpy as np

    import unikmer_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    salt = int(time.time())  # constant folded into the graph: new key

    @jax.jit
    def f(x):
        return (x * np.uint32(salt % 1000003) + np.uint32(7)).sum()

    def on_alarm(signum, frame):
        print(f"CANARY: compile not answered within {ALARM_S}s — "
              "compile queue poisoned", flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(ALARM_S)
    t0 = time.time()
    v = int(np.asarray(f(jnp.arange(256, dtype=jnp.uint32))))
    signal.alarm(0)
    print(f"CANARY: ok in {time.time() - t0:.1f}s (value {v}, "
          f"backend {jax.default_backend()})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
