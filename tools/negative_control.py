#!/usr/bin/env python3
"""Wrong-sf negative control, automated (VERDICT r15 #2's lesson as a
standing tool): a hash-gate row that still PASSES when the oracle runs at
a DIFFERENT scale factor is VACUOUS — its hash cannot detect that query
breaking, because the gate compares two things that agree for reasons
other than the query being right (empty output at every scale, a
scale-invariant verdict bit, fixture columns that coincide across
scales). The r15 judge ran this by hand and found three such rows; this
sweeps every oracle row against every wrong sf dir and names survivors,
so a new vacuous row is caught the round it is born.

Usage:
  python3 tools/negative_control.py <verify_out_dir> <wrong_sf_dir> [more_wrong_sf_dirs...]

Exit 0 when NO row survives any wrong sf; exit 1 otherwise, printing the
survivors (each needs a fix or a written scale-invariant-by-design note).
Run it with a dump made at one sf against BOTH neighbor sfs — some
fixtures coincide pairwise (sf0.001/sf0.01 share doc_ids and per-doc
`source` values), so one direction alone can miss a survivor.
"""
import re
import subprocess
import sys


def main(out_dir, wrong_sfs):
    survivors = {}
    for w in wrong_sfs:
        p = subprocess.run(
            [sys.executable, "tools/check_oracle.py", out_dir, w],
            capture_output=True, text=True)
        for q in re.findall(r"^ok   (\S+)", p.stdout, re.M):
            survivors.setdefault(q, []).append(w)
    if not survivors:
        print(f"negative control clean: no oracle row survives "
              f"{len(wrong_sfs)} wrong-sf run(s)")
        return 0
    print(f"VACUOUS rows — these pass with the oracle at the WRONG sf:")
    for q in sorted(survivors):
        print(f"  {q}: survives {', '.join(survivors[q])}")
    return 1


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2:]))
