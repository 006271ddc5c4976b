"""Differential fuzz of the staged-dual x multi-bucket x spill
composition (VERDICT round-4 next #8).

The round-4 default flip (UNIKMER_TPU_DUAL_MULTI auto) landed late;
this arm forces UNIKMER_TPU_DUAL_STEP=1 + DUAL_STAGED=1 +
MULTI_BUCKET in {2,3} + a tiny spill cap on the -u/-d streaming
pipelines and checks exact set equality against a from-scratch
multiplicity oracle (duplicate-semantics contract:
/root/reference/unikmer/cmd/util-sort.go:377-388,519-530 — the
min(count,2) non-final-round trick must keep global unique/repeated
classification exact across chunk boundaries).

scripts/fuzz_campaign.py drives run_trial over many extra seeds.
"""

from collections import Counter

import numpy as np
import pytest

from unikmer_tpu.io.fastx import Record
from unikmer_tpu.models.count import CountConfig, count_stream

_ENC = {"A": 0, "C": 1, "G": 2, "T": 3}
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _canon_code(km: str, canonical: bool) -> int | None:
    if any(c not in _ENC for c in km):
        return None
    if canonical:
        rc = "".join(_COMP[c] for c in reversed(km))
        km = min(km, rc)
    code = 0
    for c in km:
        code = (code << 2) | _ENC[c]
    return code


def oracle_multiplicity(seqs, k, canonical):
    cnt = Counter()
    for s in seqs:
        if len(s) < k:
            continue
        for i in range(len(s) - k + 1):
            c = _canon_code(s[i : i + k], canonical)
            if c is not None:
                cnt[c] += 1
    return cnt


def _gen_seqs(rng, k):
    """Messy multi-record input with heavy cross-record duplication
    (a shared backbone) and interior Ns."""
    backbone = "".join(rng.choice(list("ACGT"), size=40 + 3 * k))
    seqs = []
    for _ in range(int(rng.integers(3, 9))):
        n = int(rng.integers(k, 240))
        q = list("".join(rng.choice(list("ACGT"), size=n)))
        if rng.random() < 0.7:  # splice in the backbone for duplicates
            at = int(rng.integers(0, max(n - 1, 1)))
            q[at : at + len(backbone)] = list(backbone)[: n - at]
        for j in rng.integers(0, len(q), int(rng.integers(0, 4))):
            q[j] = "N"
        seqs.append("".join(q))
    return seqs


def run_trial(tmp_path, seed, k, monkeypatch=None):
    import os

    rng = np.random.default_rng(seed)
    seqs = _gen_seqs(rng, k)
    canonical = bool(rng.random() < 0.7)
    cnt = oracle_multiplicity(seqs, k, canonical)
    recs = [Record(b"r%d" % i, b"r%d" % i, s.encode())
            for i, s in enumerate(seqs)]
    env = {
        "UNIKMER_TPU_DUAL_STEP": "1",
        "UNIKMER_TPU_DUAL_STAGED": "1",
        "UNIKMER_TPU_DUAL_MULTI": "1",
        "UNIKMER_TPU_MULTI_BUCKET": str(int(rng.choice([2, 3]))),
        # tiny cap: force the extsort spill through the capped-
        # multiplicity chunk merge
        "UNIKMER_TPU_COUNT_MEM_MB": "0.0001",
    }
    old = {n: os.environ.get(n) for n in env}
    os.environ.update(env)
    try:
        chunk = int(rng.integers(64, 400))
        for mode, want in (
            ("distinct", {c for c in cnt}),
            ("unique", {c for c, n in cnt.items() if n == 1}),
            ("repeated", {c for c, n in cnt.items() if n >= 2}),
        ):
            cfg = CountConfig(k=k, canonical=canonical, mode=mode)
            res = count_stream(iter(recs), cfg, chunk_bases=chunk)
            if not isinstance(res, np.ndarray):  # SpilledCount
                got = []
                res.write_to(lambda codes: got.append(np.asarray(codes)))
                res = (np.concatenate(got) if got
                       else np.zeros(0, np.uint64))
            got_set = set(np.asarray(res).tolist())
            assert len(got_set) == len(res), (mode, "duplicate output")
            assert got_set == want, (
                mode, len(got_set), len(want), f"seed={seed:#x} k={k}")
    finally:
        for n, v in old.items():
            if v is None:
                os.environ.pop(n, None)
            else:
                os.environ[n] = v


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_dual_multi_spill(tmp_path, trial):
    run_trial(tmp_path, 0xD0A1 + trial, [5, 11, 21, 31][trial])
