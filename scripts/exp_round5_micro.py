#!/usr/bin/env python
"""Round-5 chip micro-attribution: WHERE do the streamed programs'
seconds go on-device?  All data device-resident, scalar-fetch forced,
so transfers are excluded — this isolates program cost.

Arms (2^25 unless noted):
  a_count_step        the headline program (sort-bound ~156 ms)
  b_unpack2bit        count_step fed from the 2-bit ingress unpack
  c_compress          b + _compress_result (the compressed egress) —
                      suspect: TWO 2^25-source scatters into 2^16
                      targets (round-1 data: random scatter 89-1169 ms
                      at 2^23 on this backend)
  d_multi_B2          the actual B=2 stacked lax.map program (z=True)
  e_scatter_only      the isolated exception scatter pair
  f_sortexc           sort-based exception compaction candidate
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from functools import partial

OUT = os.environ.get("EXP_OUT", "/tmp/round5_micro.jsonl")
N = 1 << 25
K = 23


def emit(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"## {json.dumps(rec)}", flush=True)


class Watchdog:
    def __init__(self, seconds, label):
        self.seconds, self.label = int(seconds), label

    def __enter__(self):
        signal.signal(signal.SIGALRM, lambda s, f: (_ for _ in ()).throw(
            TimeoutError(f"{self.label}: {self.seconds}s")))
        signal.alarm(self.seconds)

    def __exit__(self, *e):
        signal.alarm(0)
        return False


def probe():
    for attempt in range(20):
        try:
            with Watchdog(45, "probe"):
                x = jax.device_put(np.ones(8, np.float32))
                assert float(np.asarray(x)[0]) == 1.0
            return True
        except TimeoutError:
            print(f"probe {attempt+1}/20 timeout; sleep 90", flush=True)
            time.sleep(90)
    return False


def timed(label, fn, *args, reps=3, budget=1500):
    try:
        with Watchdog(budget, label):
            t0 = time.time()
            r = fn(*args)
            s = float(np.asarray(
                jnp.sum(r[0] if isinstance(r, tuple) else r)
                .astype(jnp.float64)))
            cold = time.time() - t0
            walls = []
            for _ in range(reps):
                t0 = time.time()
                r = fn(*args)
                float(np.asarray(jnp.sum(
                    r[0] if isinstance(r, tuple) else r)
                    .astype(jnp.float64)))
                walls.append(time.time() - t0)
        emit({"arm": label, "cold_s": round(cold, 2),
              "warm_ms": [round(w * 1e3) for w in walls],
              "best_ms": round(min(walls) * 1e3, 1), "sum": s})
        return min(walls)
    except TimeoutError as e:
        emit({"arm": label, "error": str(e)})
        return None


def main():
    from unikmer_tpu.models.count import (
        CountConfig, _compress_result, _count_step_multi, count_step,
        pack_bases_2bit, unpack_bases_2bit, _MAX_EXC,
    )

    emit({"arm": "start"})
    with Watchdog(1200, "backend init"):
        jax.devices()
    if not probe():
        emit({"arm": "abort"})
        return 2
    cfg = CountConfig(k=K, canonical=True)
    rng = np.random.default_rng(20260820)
    unit = rng.integers(0, 4, size=1 << 21, dtype=np.uint8)
    bases = np.tile(unit, N // len(unit))
    d_bases = jax.device_put(bases)
    p2, vm = pack_bases_2bit(bases)
    d_p2, d_vm = jax.device_put(p2), jax.device_put(vm)
    p2s = jax.device_put(np.stack([p2, p2]))
    vms = jax.device_put(np.stack([vm, vm]))
    _ = int(np.asarray(d_bases[0]))  # force uploads
    _ = int(np.asarray(p2s[0][0]))

    @jax.jit
    def a_count_step(b):
        out, n = count_step(b, cfg)
        return n

    @jax.jit
    def b_unpack(p, v):
        out, n = count_step(unpack_bases_2bit(p, v, N), cfg)
        return n

    @jax.jit
    def c_compress(p, v):
        out, n = count_step(unpack_bases_2bit(p, v, N), cfg)
        small, ei, ev, ne, nn = _compress_result(out, n)
        return (jnp.sum(small.astype(jnp.uint64)) + ne.astype(jnp.uint64)
                + nn.astype(jnp.uint64))

    def d_multi(ps, vs):
        return _count_step_multi(ps, vs, cfg, N, True)[4]  # nn per bucket

    sorted_codes = jax.device_put(
        np.sort(rng.integers(0, 1 << 46, N, dtype=np.uint64)))

    @jax.jit
    def e_scatter_only(out):
        idx = jnp.arange(out.shape[0], dtype=jnp.int64)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint64), out[:-1]])
        delta = out - prev
        big = delta >= jnp.uint64(1 << 32)
        pos = jnp.cumsum(big.astype(jnp.int64)) - 1
        pos = jnp.where(big & (pos < _MAX_EXC), pos, _MAX_EXC)
        exc_idx = jnp.full((_MAX_EXC,), -1, jnp.int64).at[pos].set(
            idx, mode="drop")
        exc_val = jnp.zeros((_MAX_EXC,), jnp.uint64).at[pos].set(
            out, mode="drop")
        return jnp.sum(exc_idx) + jnp.sum(exc_val.astype(jnp.int64))

    @jax.jit
    def f_sortexc(out):
        # sort-based exception compaction: one single-operand u64 sort
        # + tiny static-slice gather — no 2^25-source scatter
        idx = jnp.arange(out.shape[0], dtype=jnp.int64)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint64), out[:-1]])
        delta = out - prev
        big = delta >= jnp.uint64(1 << 32)
        key = jnp.where(big, idx.astype(jnp.uint64),
                        jnp.uint64(0xFFFFFFFFFFFFFFFF))
        skey = jax.lax.sort(key)
        exc_idx = skey[:_MAX_EXC].astype(jnp.int64)
        take = jnp.minimum(exc_idx, out.shape[0] - 1)
        exc_val = out[take]
        return jnp.sum(exc_idx) + jnp.sum(exc_val.astype(jnp.int64))

    timed("a_count_step_2e25", a_count_step, d_bases)
    timed("b_unpack2bit_2e25", b_unpack, d_p2, d_vm)
    timed("c_compress_2e25", c_compress, d_p2, d_vm)
    timed("d_multi_B2", d_multi, p2s, vms)
    timed("e_scatter_only", e_scatter_only, sorted_codes)
    timed("f_sortexc", f_sortexc, sorted_codes)
    emit({"arm": "done"})
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except TimeoutError as e:
        emit({"arm": "WATCHDOG", "error": str(e)})
        sys.exit(2)
