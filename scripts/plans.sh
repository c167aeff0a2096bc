#!/bin/sh
# Regenerate PLANS.md — the committed explain("formatted") snapshot for the
# Explain.headline query set (round-6 verdict item 8: regenerate in the same
# commit that changes any headline query instead of hand-running it).
#
# Usage: scripts/plans.sh            # sf0.01 fixtures, writes PLANS.md
#        SPARK_GRAFT_SF_DIR=... scripts/plans.sh
set -e
cd "$(dirname "$0")/.."
: "${SPARK_GRAFT_SF_DIR:=/root/testdata/sf0.01}"
export SPARK_GRAFT_SF_DIR
# program stdout is unprefixed; drop sbt's own [info]/[success] lines and
# anything before the first plan header
sbt -batch "runMain graft.Explain" 2>/dev/null \
  | grep -v '^\[' \
  | awk '/^## /{found=1} found' > PLANS.md.tmp
n=$(grep -c '^## ' PLANS.md.tmp)
if [ "$n" -lt 1 ]; then
  echo "plans.sh: no plans captured — aborting without touching PLANS.md" >&2
  rm -f PLANS.md.tmp
  exit 1
fi
mv PLANS.md.tmp PLANS.md
echo "wrote PLANS.md ($n plans)"
