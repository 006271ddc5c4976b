"""dump fast-path regressions (code-review findings): k>32 auto-hash,
u64 overflow rejection, whitespace-token divergence."""

import numpy as np
import pytest

import unikmer_tpu.cli.commands.dump as dumpmod
from unikmer_tpu.cli.main import main as cli_main
from unikmer_tpu.io.unik import UnikReader


def run_dump(tmp_path, name, inp_bytes, extra=(), disable_native=False):
    f = tmp_path / f"{name}.txt"
    f.write_bytes(inp_bytes)
    out = tmp_path / name
    orig = dumpmod._parse_fast
    if disable_native:
        dumpmod._parse_fast = lambda *a, **k: None
    try:
        rc = cli_main(["dump", str(f), "-o", str(out)] + list(extra))
    except SystemExit as e:
        rc = e.code
    finally:
        dumpmod._parse_fast = orig
    return rc, str(out) + ".unik"


def test_dump_k40_auto_hash_parity(tmp_path, rng):
    lines = [
        "".join("ACGT"[j] for j in rng.integers(0, 4, 40)) + "\n"
        for _ in range(200)
    ]
    data = "".join(lines).encode()
    rc_a, a = run_dump(tmp_path, "a", data)
    rc_b, b = run_dump(tmp_path, "b", data, disable_native=True)
    assert rc_a == 0 and rc_b == 0
    ca, _ = UnikReader(a).read_all()
    cb, _ = UnikReader(b).read_all()
    np.testing.assert_array_equal(ca, cb)
    assert UnikReader(a).header.is_hashed


@pytest.mark.parametrize("disable_native", [False, True])
def test_dump_u64_overflow_rejected(tmp_path, disable_native):
    rc, _ = run_dump(tmp_path, "ovf", b"18446744073709551616\n",
                     ["--hashed", "-k", "23"], disable_native)
    assert rc != 0


@pytest.mark.parametrize("disable_native", [False, True])
def test_dump_ws_token_rejected(tmp_path, disable_native):
    rc, _ = run_dump(tmp_path, "wst", b"ACGTA \t12\nTTTTT\t5\n",
                     disable_native=disable_native)
    assert rc != 0
