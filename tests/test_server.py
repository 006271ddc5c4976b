"""Resident device server (unikmer_tpu/server.py): the warm-process
mitigation for per-process startup + first-dispatch stalls (VERDICT
round-4 next #3).  CPU-platform integration tests: output parity with
local runs, binary stdout routing, exit codes, fallback, env scoping."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("srv") / "unikmer.sock")
    env = dict(os.environ)
    env["UNIKMER_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("UNIKMER_TPU_SERVER", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "unikmer_tpu.server", "--socket", sock,
         "--idle-timeout", "120"],
        env=env, stderr=subprocess.PIPE, text=True,
    )
    try:
        for _ in range(300):
            if os.path.exists(sock):
                break
            if proc.poll() is not None:
                raise RuntimeError(
                    f"server died: {proc.stderr.read()[-2000:]}")
            time.sleep(0.1)
        else:
            raise RuntimeError("server socket never appeared")
        yield sock
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def run_client(sock, argv, cwd=None, extra_env=None, stdin=None):
    env = dict(os.environ)
    env["UNIKMER_TPU_SERVER"] = sock
    env["UNIKMER_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "unikmer_tpu.cli.main", *map(str, argv)],
        env=env, cwd=cwd, capture_output=True, input=stdin,
        timeout=180,
    )


def _write_fa(tmp_path, rng):
    from tests.conftest import random_dna

    p = tmp_path / "in.fa"
    p.write_text(f">s1\n{random_dna(rng, 600).decode()}\n"
                 f">s2\n{random_dna(rng, 450).decode()}\n")
    return p


def test_server_count_matches_local(server, tmp_path, rng):
    from unikmer_tpu.cli.main import main as local_main
    from unikmer_tpu.io.unik import UnikReader

    fa = _write_fa(tmp_path, rng)
    # local (in this process, cpu backend via conftest)
    a = tmp_path / "local"
    assert local_main(["count", "-k", "23", "-K", "-s", str(fa),
                       "-o", str(a)]) == 0
    # via server
    b = tmp_path / "srv"
    r = run_client(server, ["count", "-k", 23, "-K", "-s", fa, "-o", b])
    assert r.returncode == 0, r.stderr.decode()
    with UnikReader(f"{a}.unik") as ra, UnikReader(f"{b}.unik") as rb:
        ca, _ = ra.read_all()
        cb, _ = rb.read_all()
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_server_second_command_is_fast(server, tmp_path, rng):
    """The whole point: request #2 must not pay interpreter+import+
    compile again.  On CPU the bar is generous (no tunnel), but a
    regression to per-request re-import/re-compile would blow it."""
    fa = _write_fa(tmp_path, rng)
    out1 = tmp_path / "o1"
    r = run_client(server, ["count", "-k", 23, "-K", "-s", fa, "-o", out1])
    assert r.returncode == 0, r.stderr.decode()
    t0 = time.time()
    out2 = tmp_path / "o2"
    r = run_client(server, ["count", "-k", 23, "-K", "-s", fa, "-o", out2])
    dt = time.time() - t0
    assert r.returncode == 0, r.stderr.decode()
    assert dt < 10, f"warm request took {dt:.1f}s"


def test_server_stdout_and_exit_codes(server, tmp_path, rng):
    fa = _write_fa(tmp_path, rng)
    out = tmp_path / "o"
    r = run_client(server, ["count", "-k", 23, "-K", "-s", fa, "-o", out])
    assert r.returncode == 0
    # text stdout routes back through the passed fd
    r = run_client(server, ["view", f"{out}.unik"])
    assert r.returncode == 0, r.stderr.decode()
    lines = r.stdout.decode().strip().splitlines()
    assert len(lines) > 100 and len(lines[0]) == 23
    # error path: missing file -> nonzero exit, message on stderr
    r = run_client(server, ["view", str(tmp_path / "nope.unik")])
    assert r.returncode != 0
    assert b"nope.unik" in r.stderr or b"ERROR" in r.stderr.upper()


def test_server_env_scoping(server, tmp_path):
    """A request's UNIKMER_* env must apply to that request and not
    leak into the next one (UNIKMER_TPU_DEBUG's traceback-on-error
    behavior as the probe)."""
    bad = tmp_path / "bad.unik"
    bad.write_bytes(b"garbage-not-a-unik-file-0123456789")
    missing = str(bad)
    r = run_client(server, ["view", missing],
                   extra_env={"UNIKMER_TPU_DEBUG": "1"})
    assert r.returncode != 0
    assert b"Traceback" in r.stderr, r.stderr.decode()
    r = run_client(server, ["view", missing])
    assert r.returncode != 0
    assert b"Traceback" not in r.stderr, r.stderr.decode()


def test_server_cwd_per_request(server, tmp_path, rng):
    fa = _write_fa(tmp_path, rng)
    r = run_client(server, ["count", "-k", 23, "-K", "-s", fa.name,
                            "-o", "rel_out"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr.decode()
    assert (tmp_path / "rel_out.unik").exists()


def test_client_falls_back_without_server(tmp_path, rng):
    fa = _write_fa(tmp_path, rng)
    out = tmp_path / "o"
    r = run_client(str(tmp_path / "no-such.sock"),
                   ["count", "-k", 23, "-K", "-s", fa, "-o", out])
    assert r.returncode == 0, r.stderr.decode()
    assert (tmp_path / "o.unik").exists()


def test_client_no_local_rerun_after_delivery(tmp_path, rng):
    """If the server dies AFTER the request was delivered, the client
    must NOT re-run locally (partial execution would duplicate side
    effects) — it exits nonzero with a diagnostic (round-5 review)."""
    import socket as socket_mod
    import threading

    sock = str(tmp_path / "half.sock")
    srv = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
    srv.bind(sock)
    srv.listen(1)

    def half_server():
        conn, _ = srv.accept()
        # receive the fds + request, then close WITHOUT replying
        msg, fds, *_ = socket_mod.recv_fds(conn, 1, 3)
        for fd in fds:
            os.close(fd)
        n = int.from_bytes(conn.recv(4), "big")
        while n > 0:
            n -= len(conn.recv(n))
        conn.close()

    t = threading.Thread(target=half_server, daemon=True)
    t.start()
    fa = _write_fa(tmp_path, rng)
    out = tmp_path / "o"
    r = run_client(sock, ["count", "-k", 23, "-K", "-s", fa, "-o", out])
    t.join(timeout=10)
    srv.close()
    assert r.returncode == 255, (r.returncode, r.stderr.decode())
    assert b"NOT re-running locally" in r.stderr
    # and crucially: the command did NOT run locally
    assert not (tmp_path / "o.unik").exists()
