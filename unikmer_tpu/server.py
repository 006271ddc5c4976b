"""Resident device server: one warm process serves many CLI commands.

Motivation (VERDICT round-4 next #3): on tunnel-attached TPU hosts
every process pays ~3.3 s of interpreter-start relay dial plus an
~8-9 min first-dispatch warm-up stall (docs/BENCH_NOTES.md round-4
session C) — which makes one-shot CLI device commands practically
unusable.  A single long-lived process holds the dialed backend, the
warmed session, and every compiled program; subsequent commands reuse
all three.  The reference's cold start is 0.9 s
(/root/reference/README.md:156-158) because its engine is a local
binary — this server is the tpu-native way to match that UX behind a
remote accelerator.

Protocol (unix domain socket, one request per connection):

  client -> server:  1 byte (0x01) carrying SCM_RIGHTS fds
                     [stdin, stdout, stderr]
                     4-byte big-endian length + JSON request
                     {"argv": [...], "cwd": "...", "env": {...}}
  server -> client:  4-byte big-endian signed exit code (after the
                     command finished and its output was written
                     directly to the passed fds)

The server runs each command IN-PROCESS via cli.main.main() with fds
0/1/2 dup2'd to the client's (so native code and Python writes both
land in the client's terminal/pipes), cwd switched, and the client's
UNIKMER* environment applied for the duration.  Requests are served
serially — device work must never run concurrently on this backend
(CLAUDE.md wedge discipline), and serialization is exactly the
semantics a single chip gives anyway.

CAVEAT — trace-time knobs: env vars read when a program is first
TRACED (UNIKMER_TPU_SORT_SPLIT/SORT_STABLE/SORT_COMPACT/PALLAS_SORT,
...) bind on the server's first compile of a shape and are NOT
re-applied for later requests that hit the jit cache.  Routing-time
knobs (HOST_COUNT, DEVICE_TAXID, TAXID_STAGED, MULTI_BUCKET, mesh,
...) are read per call and work normally.  Drive per-arm trace-knob
experiments with fresh processes, not through one server.

Run:    python -m unikmer_tpu.server --socket /tmp/unikmer.sock --warm
Client: UNIKMER_TPU_SERVER=/tmp/unikmer.sock unikmer-tpu count ...
        (cli.main dispatches automatically; falls back to local
        execution when the socket is absent/dead)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import time
import traceback

_REQ_MAX = 1 << 20
# env the server must never inherit from a client: the launcher's
# re-exec pins (execvpe inside the server would replace it) and the
# server marker itself (a command running in-server must not try to
# re-dispatch to the server)
_ENV_STRIP = ("UNIKMER_TPU_LAUNCHER_PINNED", "UNIKMER_TPU_SAVED_POOL",
              "UNIKMER_TPU_SERVER")


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = conn.recv(n - len(buf))
        if not part:
            raise ConnectionError("client closed mid-request")
        buf += part
    return buf


def _apply_env(env: dict) -> dict:
    """Set the request's env view; return the saved state to restore."""
    saved = {}
    for k, v in env.items():
        if k in _ENV_STRIP:
            continue
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    # UNIKMER* vars the client did NOT send must not leak in from a
    # previous request: clear any not in this request
    for k in list(os.environ):
        if (k.startswith("UNIKMER") and k not in env
                and k not in _ENV_STRIP and k != "UNIKMER_TPU_IN_SERVER"
                and k not in _SERVER_OWN_ENV):
            saved[k] = os.environ.pop(k)
    return saved


def _restore_env(saved: dict) -> None:
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


# env vars that belong to the server process itself (captured at
# startup) and survive request-scoped clearing
_SERVER_OWN_ENV: set = set()


def _handle(conn: socket.socket, verbose: bool) -> None:
    msg, fds, _flags, _addr = socket.recv_fds(conn, 1, 3)
    if len(fds) < 3:
        for fd in fds:
            os.close(fd)
        raise ConnectionError(f"expected 3 fds, got {len(fds)}")
    try:
        n = int.from_bytes(_recv_exact(conn, 4), "big")
        if n > _REQ_MAX:
            raise ConnectionError(f"request too large ({n} bytes)")
        req = json.loads(_recv_exact(conn, n).decode())
        argv = [str(a) for a in req.get("argv", [])]
        cwd = req.get("cwd", os.getcwd())
        env = {str(k): str(v) for k, v in req.get("env", {}).items()}
        if verbose:
            print(f"[server] {time.strftime('%H:%M:%S')} "
                  f"run: {' '.join(argv)}", file=sys.stderr, flush=True)
        t0 = time.time()
        code = _run_request(argv, cwd, env, fds)
        if verbose:
            print(f"[server] done rc={code} in {time.time()-t0:.2f}s",
                  file=sys.stderr, flush=True)
    finally:
        for fd in fds:
            try:
                os.close(fd)
            except OSError:
                pass
    conn.sendall(int(code).to_bytes(4, "big", signed=True))


def _run_request(argv: list, cwd: str, env: dict, fds: list) -> int:
    old_cwd = os.getcwd()
    saved_env = _apply_env(env)
    saved_fds = [os.dup(i) for i in (0, 1, 2)]
    old_streams = (sys.stdin, sys.stdout, sys.stderr)
    old_argv = sys.argv
    for s in (sys.stdout, sys.stderr):
        try:
            s.flush()
        except Exception:
            pass
    try:
        os.chdir(cwd)
        for i, fd in zip((0, 1, 2), fds):
            os.dup2(fd, i)
        # fresh wrappers so a command closing sys.stdout (BrokenPipe
        # path) cannot take down the server's own streams
        sys.stdin = open(0, "r", closefd=False)
        sys.stdout = open(1, "w", closefd=False)
        sys.stderr = open(2, "w", closefd=False)
        sys.argv = ["unikmer-tpu", *argv]
        from .cli.main import main

        try:
            return int(main(argv) or 0)
        except SystemExit as e:  # belt and braces: main() converts these
            c = e.code
            return 0 if c is None else (c if isinstance(c, int) else 255)
        except BaseException:
            traceback.print_exc()
            return 255
    finally:
        for s in (sys.stdout, sys.stderr):
            try:
                s.flush()
            except Exception:
                pass
        sys.stdin, sys.stdout, sys.stderr = old_streams
        sys.argv = old_argv
        for i, fd in zip((0, 1, 2), saved_fds):
            os.dup2(fd, i)
            os.close(fd)
        os.chdir(old_cwd)
        _restore_env(saved_env)


def _warm(pretouch: bool) -> None:
    """Pay the session warm-up (and optionally the flagship compile +
    first large dispatch) at server start instead of on the first
    request."""
    import numpy as np

    from .models.count import CountConfig, count_packed, _warm_device_session
    from .io.fastx import PackedSeqs

    t0 = time.time()
    _warm_device_session()
    print(f"[server] session warm in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    if pretouch:
        # the known tunnel pathology stalls the FIRST large dispatch of
        # a process ~8-9 min; absorb it here so requests run at full
        # speed (BENCH_NOTES round-4 session C)
        t0 = time.time()
        rng = np.random.default_rng(0)
        bases = rng.integers(0, 4, size=1 << 23, dtype=np.uint8)
        packed = PackedSeqs(bases, np.zeros(1, np.int64),
                            np.asarray([len(bases)], np.int64))
        n = len(count_packed(packed, CountConfig(k=23, canonical=True)))
        print(f"[server] pre-touch dispatch ({n} codes) in "
              f"{time.time()-t0:.1f}s", file=sys.stderr, flush=True)


def serve(sock_path: str, idle_timeout: float | None = None,
          warm: bool = False, pretouch: bool = False,
          verbose: bool = True, ready_cb=None) -> None:
    global _SERVER_OWN_ENV
    _SERVER_OWN_ENV = {k for k in os.environ if k.startswith("UNIKMER")}
    os.environ["UNIKMER_TPU_IN_SERVER"] = "1"
    try:
        os.unlink(sock_path)
    except FileNotFoundError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        srv.bind(sock_path)
        os.chmod(sock_path, 0o600)
        srv.listen(8)
        if warm or pretouch:
            _warm(pretouch)
        if idle_timeout:
            srv.settimeout(idle_timeout)
        if verbose:
            print(f"[server] listening on {sock_path}", file=sys.stderr,
                  flush=True)
        if ready_cb is not None:
            ready_cb()
        while True:
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                if verbose:
                    print(f"[server] idle {idle_timeout:.0f}s — exiting",
                          file=sys.stderr, flush=True)
                break
            try:
                _handle(conn, verbose)
            except (ConnectionError, OSError) as e:
                if verbose:
                    print(f"[server] request failed: {e}",
                          file=sys.stderr, flush=True)
            except Exception:
                traceback.print_exc()
            finally:
                try:
                    conn.close()
                except OSError:
                    pass
    finally:
        srv.close()
        try:
            os.unlink(sock_path)
        except FileNotFoundError:
            pass


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="unikmer-tpu-server",
        description="resident unikmer-tpu device server")
    ap.add_argument("--socket", default=os.environ.get(
        "UNIKMER_TPU_SERVER", "/tmp/unikmer-tpu.sock"))
    ap.add_argument("--idle-timeout", type=float, default=0,
                    help="exit after N seconds with no requests "
                         "(0 = run forever)")
    ap.add_argument("--warm", action="store_true",
                    help="establish the device session at startup")
    ap.add_argument("--pretouch", action="store_true",
                    help="also absorb the first-large-dispatch stall "
                         "at startup (implies --warm)")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    serve(args.socket, idle_timeout=args.idle_timeout or None,
          warm=args.warm, pretouch=args.pretouch,
          verbose=not args.quiet)
    return 0


if __name__ == "__main__":
    sys.exit(main())
