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

r17 (VERDICT r16 #3 + ADVICE r16): the sweep now covers BOTH gate tiers —
check_oracle.py's hash rows AND check_tolerance.py's value-gated rows —
and it FAILS CLOSED: a checker run whose `== N ok, M fail` summary line
is missing (crash, import error, bad path) exits nonzero instead of
reading as "clean".

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

CHECKERS = ["tools/check_oracle.py", "tools/check_tolerance.py"]


def sweep(checker, out_dir, wrong_sf):
    """Run one checker at a wrong sf; return the queries that PASSED.

    Fails closed: a run with no parseable `== N ok, M fail` summary (the
    child crashed before its verdict, or its output format drifted) is an
    error, not a clean sweep — the r16 form silently treated it as clean.
    """
    p = subprocess.run([sys.executable, checker, out_dir, wrong_sf],
                       capture_output=True, text=True)
    m = re.search(r"^== (\d+) ok, (\d+) fail$", p.stdout, re.M)
    if not m:
        sys.exit(f"negative_control: {checker} at {wrong_sf} produced no "
                 f"'== N ok, M fail' summary (exit {p.returncode}) — the "
                 f"control cannot run. stderr:\n{p.stderr[-2000:]}")
    ok = re.findall(r"^ok   (\S+)", p.stdout, re.M)
    if len(ok) != int(m.group(1)):
        sys.exit(f"negative_control: {checker} at {wrong_sf}: summary says "
                 f"{m.group(1)} ok but {len(ok)} 'ok' lines parsed — "
                 f"format drift, refusing to fail open")
    return ok


def main(out_dir, wrong_sfs):
    survivors = {}
    for w in wrong_sfs:
        for checker in CHECKERS:
            for q in sweep(checker, out_dir, w):
                survivors.setdefault(q, []).append(w)
    if not survivors:
        print(f"negative control clean: no oracle or tolerance row "
              f"survives {len(wrong_sfs)} wrong-sf run(s)")
        return 0
    print("VACUOUS rows — these pass with the oracle at the WRONG sf:")
    for q in sorted(survivors):
        print(f"  {q}: survives {', '.join(survivors[q])}")
    return 1


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2:]))
