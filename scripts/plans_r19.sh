#!/bin/sh
# Round-19 before/after plan snapshots: scripts/plans_r19.sh <suffix> <query...>
# Writes plans/r19/<query>_<suffix>.txt with the same expression-id
# normalization as scripts/plans.sh so before/after diffs are meaningful.
set -e
cd "$(dirname "$0")/.."
suffix="$1"; shift
: "${SPARK_GRAFT_SF_DIR:=/root/testdata/sf0.01}"
export SPARK_GRAFT_SF_DIR
mkdir -p plans/r19
sbt -batch "runMain graft.Explain $*" 2>/dev/null \
  | grep -v '^\[' \
  | sed -E 's/#[0-9]+/#N/g; s/plan_id=[0-9]+/plan_id=N/g; s/(Subquery|subquery|cte)([ _]?)[0-9]+/\1\2N/g; s/RDD\[[0-9]+\]/RDD[N]/g; s/Lambda\$[0-9]+\/0x[0-9a-f]+@[0-9a-f]+/Lambda\$N/g' \
  | awk '/^## /{found=1} found' > /tmp/plans_r19.tmp
awk -v sfx="$suffix" '
  /^## /  { key=$2; out="plans/r19/" key "_" sfx ".txt"; started=0; printf "" > out; next }
  /^```$/ { next }
  out != "" {
    if (!started && $0 == "") next
    started = 1
    print >> out
  }
' /tmp/plans_r19.tmp
rm -f /tmp/plans_r19.tmp
ls plans/r19/*_"$suffix".txt | wc -l
