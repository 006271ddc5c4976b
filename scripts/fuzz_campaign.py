#!/usr/bin/env python
"""Extended differential-fuzz campaign.

Drives the committed pipeline-vs-oracle fuzzers (tests/test_fuzz_cli_oracle.py,
tests/test_fuzz_taxid_oracle.py) over many extra (seed, k) pairs beyond the
handful pinned in the suite.  Host/CPU only — safe to run any time.

    UNIKMER_TPU_PLATFORM=cpu python scripts/fuzz_campaign.py [N_TRIALS] [BASE_SEED]

Prints one line per trial; on failure prints the (module, seed, k) repro
triple and continues, summarizing at the end (exit 1 if any failed).
"""
import pathlib
import sys
import tempfile
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import numpy as np  # noqa: E402

import test_count_host as count_host_parity  # noqa: E402
import test_fuzz_cli_oracle as cli_oracle  # noqa: E402
import test_fuzz_dual_multi as dual_multi  # noqa: E402
import test_fuzz_taxid_oracle as taxid_oracle  # noqa: E402


class _ParityMod:
    @staticmethod
    def run_trial(tmp, seed, k):  # k unused: the trial randomizes it
        count_host_parity.run_parity_trial(
            tmp, np.random.default_rng(seed))


_ParityMod.__name__ = "count_host_parity"

KS = [3, 5, 7, 11, 13, 17, 21, 23, 27, 31]
KS_TAXID = [5, 7, 11, 13, 17, 21, 23, 27, 31]  # taxid paths need k>=5


def main(argv):
    n = int(argv[1]) if len(argv) > 1 else 40
    base = int(argv[2], 0) if len(argv) > 2 else 0xF00D
    rng = np.random.default_rng(base)
    failures = []
    total = 0
    for i in range(n):
        for mod, ks in ((cli_oracle, KS), (taxid_oracle, KS_TAXID),
                        (_ParityMod, KS), (dual_multi, KS)):
            seed = base + 1000 + i
            k = int(rng.choice(ks))
            tag = f"{mod.__name__} seed={seed:#x} k={k}"
            total += 1
            try:
                with tempfile.TemporaryDirectory() as td:
                    mod.run_trial(pathlib.Path(td), seed, k)
                print(f"ok   {tag}", flush=True)
            except Exception:
                failures.append(tag)
                print(f"FAIL {tag}", flush=True)
                traceback.print_exc()
    print(f"\n{total} trials, {len(failures)} failures")
    for f in failures:
        print("  repro:", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
