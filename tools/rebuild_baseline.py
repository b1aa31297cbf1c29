"""Rebuild BASELINE.md's numbers table: one table, every registered query,
one Total line at the bottom.

Usage: python tools/rebuild_baseline.py BENCH.json [EXTRA.json ...]

Merge policy (the baseline contract is "first implementation run defines
the baseline", so existing rows are KEPT verbatim):
- a key with an existing row keeps its value and date, UNLESS listed in
  RE_RECORD (plan changed this round, or the round-4 verdict ordered a
  re-record because the old row was measured under host contention);
- a key with no row gets one from the bench JSON(s), dated today.

The script fails if any registered query still lacks a number afterwards —
that is the exact gap (missing 2x-gate denominator) it exists to close.
"""

import datetime
import json
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from presto_weather_spark.registry import all_queries  # noqa: E402

# Keys whose existing BASELINE row should be OVERWRITTEN by this run
# (plan changed, or the verdict ordered a re-record). Empty between such
# events — "first run defines baseline" for everything else.
# Round 7: s14e and x23 re-recorded per verdict task #7 — both
# reproduced at 1.4-1.6x across rounds 6 AND 7 (quiet-host min-of-2,
# identical plans), so the 2026-08-13 rows were measured in a
# stale-fast host window, not regressed by any change.
# Round 8: x76 re-recorded because its PLAN changed by design (the
# count-gated global numbering replacing the single-reducer window, the
# round's skew-safety mandate) — the gate's count action adds ~0.25 s of
# fixed cost at fixture scale, the price of the bounded 100-TB path.
# Round 9: x46 re-recorded per the round-8 verdict's adjudication order —
# its 2026-08-14 row predates BOTH the round-8 scale fix (group-limit
# window + checkpointed shared subtree + zero-token side path) and the
# round-9 constant shave (single-tokenize d checkpoint + probe-gated
# zero path); the post-fix plan reproduced at 0.54-0.55 s across rounds
# 8 and 9 (quiet-host min-of-2/3 full-bench runs), so the pre-fix row is
# not a valid denominator for the deliberately different plan.
# Round 10: plans deliberately changed for correctness/fidelity, so the
# old rows are not valid denominators —
#   x03b/x03d/x03f: in-engine recall gates (one extra exact-x03 pass + a
#     single bounded gate action per run, round-9 verdict task #1);
#   x02g: gate fused to ONE driver action (task #3);
#   s05b/s05c/s05m/x06/s52: standard-SQL empty-input grand-total row via
#     an O(1) limit-probe (grand_total_if_empty);
#   x26: deterministic (count DESC, term) re-rank of the full tracked
#     sketch map (the singleton-corpus tie fix);
#   x30: degenerate-range guard branch around the bin division.
# Round-10 adjudication (round-9 verdict What's-wrong #2, the x46/s14e/x23
# precedent): x04b / s06e / s11 / x05b reproduced at 1.15-1.5x across
# THREE round-10 quiet-host full runs with byte-identical plans, inside a
# host window where many UNTOUCHED sub-second keys drifted the same way
# (run totals 243/284/236 s vs round-9's 197 s) — host drift, not
# regressions; their pre-drift rows are stale denominators and are
# re-recorded at this round's min-of-runs. r09_12 and s03 — untouched
# this round, >= 1.5x in the min-of-3 under the same drift — are
# adjudicated identically.
# (x46's round-9 re-record landed in BASELINE.md; it is no longer listed.)
# The round-10 set (17 keys: the gate/fidelity plan changes x03b/x03d/
# x03f/x02g, the grand-total keys s05b/c/m + x06 + s52, the tie/guard
# fixes x26/x30, and the host-drift adjudications x04b/s06e/s11/x05b/
# r09_12/s03) was re-stamped by the round-10 seal's min-of-3 and then
# CLEARED — later rebuilds in the same round only ADD rows for new keys,
# so the adjudicated numbers don't churn with every merge.
RE_RECORD: set[str] = set()

ROW = re.compile(r"^\| (\w+) \| ([\d.]+) \| ([\d.]+) \| (.*?) \| (\d{4}-\d{2}-\d{2}) \|$")


def main() -> None:
    fresh: dict[str, float] = {}
    sf = cpus = ver = None
    for path in sys.argv[1:]:
        b = json.load(open(path))
        fresh.update(b["queries"])
        sf, cpus, ver = b["sf"], b["cpus"], b["spark_version"]

    p = "BASELINE.md"
    text = open(p).read()
    lines = text.splitlines()
    hdr_i = next(i for i, l in enumerate(lines) if l.startswith("| query id |"))
    # kept rows preserve their FULL provenance (sf, value, config, date):
    # a later round on a different Spark version or core count must not
    # relabel a verbatim-kept measurement with the new config
    old_rows: dict[str, tuple[str, str, str, str]] = {}
    for i in range(hdr_i, len(lines)):
        m = ROW.match(lines[i])
        if m:
            old_rows[m.group(1)] = (m.group(2), m.group(3), m.group(4), m.group(5))
    # progression line lives after the table block; find it anywhere below
    prog = [l for l in lines[hdr_i:] if l.startswith("Progression at sf0.1:")]
    prog_block = []
    if prog:
        j = lines.index(prog[0])
        prog_block = lines[j:]

    today = datetime.date.today().isoformat()
    cfg = f"local[{cpus}], AQE on, Spark {ver}"
    out_rows = []
    total = 0.0
    missing = []
    for key in sorted(all_queries()):
        if key in old_rows and key not in RE_RECORD:
            row_sf, val, row_cfg, date = old_rows[key]
        elif key in fresh:
            row_sf, val, row_cfg, date = str(sf), str(round(float(fresh[key]), 3)), cfg, today
        else:
            missing.append(key)
            continue
        total += float(val)
        out_rows.append(f"| {key} | {row_sf} | {val} | {row_cfg} | {date} |")
    if missing:
        raise SystemExit(f"no baseline number for: {missing}")

    n = len(out_rows)
    table = (
        "| query id | sf | sec | spark config | date |\n|---|---|---|---|---|\n"
        + "\n".join(out_rows)
        + f"\n\n**Total: {round(total, 1)} s across {n} queries at sf{sf}** "
        "(wall-clock per query via noop sink; warm-up amortizes JVM/codegen + "
        "Python-datasource worker start-up). Totals use the round-3+ "
        "early-stop protocol (min of up-to-3 reps); rows keep their "
        "first-recorded value and date unless the plan changed, so the "
        "total mixes measurement dates by design.\n"
    )
    head = "\n".join(lines[:hdr_i]).rstrip() + "\n\n"
    out = head + table
    if prog_block:
        out += "\n" + "\n".join(prog_block).rstrip() + "\n"
    open(p, "w").write(out)
    print(f"BASELINE.md rebuilt: {n} rows, total {round(total, 1)} s, "
          f"{len([k for k in fresh if k not in old_rows])} new, "
          f"{len(RE_RECORD)} re-recorded")


if __name__ == "__main__":
    main()
