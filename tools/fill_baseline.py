"""Write the bench numbers table into BASELINE.md from a bench JSON line."""
import json, sys, datetime

bench = json.load(open(sys.argv[1]))
rows = [f"| {k} | {bench['sf']} | {v} | local[{bench['cpus']}], AQE on, Spark {bench['spark_version']} | {datetime.date.today()} |"
        for k, v in sorted(bench["queries"].items())]
table = ("| query id | sf | sec (1 warm-up, then timed) | spark config | date |\n"
         "|---|---|---|---|---|\n" + "\n".join(rows)
         + f"\n\n**Total: {bench['value']} s across {bench['n_queries']} queries at sf{bench['sf']}** "
         "(wall-clock per query via noop sink; warm-up amortizes JVM/codegen + "
         "Python-datasource worker start-up).\n")
p = "BASELINE.md"
s = open(p).read()
marker = "Numbers table (to be filled by the first BENCH run):"
head = s.split(marker)[0]
open(p, "w").write(head + "Numbers table (first implementation run = the baseline):\n\n" + table)
print("BASELINE.md updated")
