#!/usr/bin/env bash
# Refresh README's COUNTS block from ground truth (round-9 verdict item 2).
#
# Sources:
#   - query/oracle counts: `sbt runMain graft.Counts` (SparkEntry itself);
#   - test count: sum of tests="N" in target/test-reports/*.xml
#     (run `sbt test` first);
#   - bench line: the newest BENCH_r*.json in the repo root.
# CountsSpec asserts the query/oracle numbers against SparkEntry on every
# `sbt test`, so a drifted README fails the suite even if this script is
# never run; this script exists to UPDATE the block (and the test/bench
# lines CountsSpec can't assert about itself).
set -euo pipefail
cd "$(dirname "$0")/.."

line=$(sbt -batch "runMain graft.Counts" 2>/dev/null | grep GRAFT_COUNTS)
nq=$(sed -E 's/.*queries=([0-9]+).*/\1/' <<<"$line")
no=$(sed -E 's/.*oracled=([0-9]+).*/\1/' <<<"$line")

tests=$(python3 - <<'EOF'
import glob, re
total = 0
for f in glob.glob('target/test-reports/*.xml'):
    m = re.search(r'tests="(\d+)"', open(f).read())
    if m: total += int(m.group(1))
print(total)
EOF
)

read -r bench sf < <(python3 - <<'EOF'
import glob, json, re
benches = sorted(glob.glob('BENCH_r*.json'))
b = json.load(open(benches[-1]))
val, sf = b.get('value'), b.get('sf', '?')
if val is None and 'tail' in b:
    # driver wrapper: {"n","rc","cpus","sf","tail"} where tail holds the
    # final Bench stdout lines; the total is the LAST metric line
    m = re.findall(r'"metric":"total","value":([0-9.]+)', b['tail'])
    if m:
        val = float(m[-1])
print(round(val or 0, 1), sf)
EOF
)

python3 - "$nq" "$no" "$tests" "$bench" "$sf" <<'EOF'
import re, sys
nq, no, tests, bench, sf = sys.argv[1:6]
nn = int(nq) - int(no)
src = open('README.md').read()
block = (f"Live counts: {nq} declared queries, {no} DuckDB-oracled ({nn} approximate /\n"
         f"iterative / non-SQL-expressible, law-tested instead). Tests: {tests} green.\n"
         f"Local bench: {bench} s / {nq} queries at sf{sf}.\n")
new = re.sub(r'(?s)(<!-- COUNTS:BEGIN.*?-->\n).*?(<!-- COUNTS:END -->)',
             lambda m: m.group(1) + block + m.group(2), src)
new = re.sub(r'## Operator inventory \(\d+ queries; \d+ DuckDB-oracled\)',
             f'## Operator inventory ({nq} queries; {no} DuckDB-oracled)', new)
open('README.md', 'w').write(new)
print(f"COUNTS block <- queries={nq} oracled={no} tests={tests} bench={bench}s sf{sf}")
EOF
