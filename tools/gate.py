"""End-of-round gate — run this as the LAST step before any end-of-round
commit. It exists because round 5's only red mark was bookkeeping drift:
x139 was registered in the final snapshot commit AFTER the audit log and
baseline table were refreshed, so the round shipped with a failing drift
test. This tool makes that slip mechanical to catch:

    python tools/gate.py

Checks (all must pass; exits non-zero otherwise):
 1. registry <-> SURVEY section-2 drift test (both directions), via the
    same pytest the round bar uses;
 2. BASELINE.md completeness — every registered key has a numbers-table
    row (the 2x perf gate needs a denominator for every key);
 3. sf0.1 audit-log coverage — the newest AUDIT_sf0.1_r*.log contains a
    status line for every registered key and reports zero failures;
 4. README.md's "Registered queries: **N**" line matches the registry
    (round 6 shipped README saying 309 against a 318-key registry);
 5. (only with --require-sf001) the newest AUDIT_sf0.01_r*.log ALSO covers
    every key with zero failures — sf0.01 is the scale the DRIVER samples
    at, and dialect drift can be scale-dependent (integer DIV boundaries,
    empty-group degenerates), so a round may opt into proving both.

If (3)/(5) name missing keys, refresh the log:

    SF_DIR=/root/testdata/sf0.1 python tools/oracle_audit.py \
        2>&1 | tee AUDIT_sf0.1_rNN.log
    SF_DIR=/root/testdata/sf0.01 python tools/oracle_audit.py \
        2>&1 | tee AUDIT_sf0.01_rNN.log

and for (2) merge fresh bench numbers with tools/rebuild_baseline.py.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from presto_weather_spark.registry import all_queries  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROW = re.compile(r"^\| (\w+) \| [\d.]+ \| [\d.]+ \| .*? \| \d{4}-\d{2}-\d{2} \|$")
STATUS = re.compile(r"^\s*(\w+): (ok|rows-only)")


def main() -> int:
    keys = sorted(all_queries())
    problems: list[str] = []

    # 1. drift test (registry <-> SURVEY section 2, both directions)
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_survey_registry_drift.py", "-q", "--no-header"],
        cwd=REPO, capture_output=True, text=True,
    )
    if r.returncode != 0:
        tail = "\n".join(r.stdout.strip().splitlines()[-3:])
        problems.append(f"DRIFT: survey/registry drift test failed:\n{tail}")
    else:
        print(f"gate 1: drift test green ({len(keys)} registered keys)")

    # 2. BASELINE.md row per key
    rows = set()
    for line in open(os.path.join(REPO, "BASELINE.md")):
        m = ROW.match(line.rstrip())
        if m:
            rows.add(m.group(1))
    missing = [k for k in keys if k not in rows]
    if missing:
        problems.append(
            f"BASELINE: {len(missing)} registered key(s) lack a BASELINE.md "
            f"row (run bench.py + tools/rebuild_baseline.py): {missing[:10]}"
        )
    else:
        print(f"gate 2: BASELINE.md covers all {len(keys)} keys")

    # 3. newest sf0.1 audit log covers every key with zero failures
    #    (5., opt-in: same check against the newest sf0.01 log — the
    #    driver's own scale factor)
    audits = [("gate 3", "AUDIT_sf0.1_r*.log", "sf0.1")]
    if "--require-sf001" in sys.argv:
        audits.append(("gate 5", "AUDIT_sf0.01_r*.log", "sf0.01"))
    # expected tallies derive from the registry itself (round-8 verdict
    # task #5: make the (ok, fail, rows-only) counts an ARITHMETIC gate,
    # not an editorial one): every oracle-bearing key must be 'ok', every
    # oracle=None key 'rows-only', failures and residual RISK tags zero.
    q = all_queries()
    want_rows_only = sum(1 for k in keys if q[k].oracle is None)
    want_ok = len(keys) - want_rows_only
    for label, pattern, sf in audits:
        logs = sorted(glob.glob(os.path.join(REPO, pattern)))
        if not logs:
            problems.append(f"AUDIT: no {pattern} present")
            continue
        latest = logs[-1]
        text = open(latest, errors="replace").read()
        seen = {m.group(1) for m in
                (STATUS.match(l) for l in text.splitlines()) if m}
        uncovered = [k for k in keys if k not in seen]
        fail_m = re.search(r"(\d+) ok, (\d+) fail, (\d+) rows-only", text)
        got = tuple(int(g) for g in fail_m.groups()) if fail_m else None
        risk_tags = re.findall(r"RISK:\S+", text)
        if uncovered:
            problems.append(
                f"AUDIT: {os.path.basename(latest)} lacks entries for "
                f"{len(uncovered)} key(s): {uncovered[:10]} — refresh the "
                f"full {sf} audit log"
            )
        elif got != (want_ok, 0, want_rows_only):
            problems.append(
                f"AUDIT: {os.path.basename(latest)} tallies {got} != "
                f"registry-expected ({want_ok} ok, 0 fail, "
                f"{want_rows_only} rows-only)"
            )
        elif risk_tags:
            problems.append(
                f"AUDIT: {os.path.basename(latest)} carries "
                f"{len(risk_tags)} residual RISK tag(s) "
                f"({sorted(set(risk_tags))[:5]}) — the oracle-fragility "
                f"classes were burned to 0 in round 9; burn the new one"
            )
        else:
            print(
                f"{label}: {os.path.basename(latest)} covers all "
                f"{len(keys)} keys, {want_ok} ok / 0 fail / "
                f"{want_rows_only} rows-only, 0 RISK tags"
            )

    # 4. README registered-query count must match the registry
    readme = open(os.path.join(REPO, "README.md"), errors="replace").read()
    m = re.search(r"Registered queries: \*\*(\d+)\*\*", readme)
    if not m:
        problems.append("README: no 'Registered queries: **N**' line found")
    elif int(m.group(1)) != len(keys):
        problems.append(
            f"README: says {m.group(1)} registered queries but the registry "
            f"holds {len(keys)} — update the README line"
        )
    else:
        print(f"gate 4: README count matches registry ({len(keys)})")

    if problems:
        print("\nGATE FAILED:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print("\nGATE PASSED — safe to commit the end-of-round snapshot.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
