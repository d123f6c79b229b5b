#!/bin/bash
# Randomized reference-fidelity sweep: N seeded fixture variants
# (scripts/gen_fixture.py), each run through BOTH the reference engine
# itself (reference_oracle.py: its Python writers + SQLite executing
# its real create_views.sql) and graft's view layer (FidelitySweep,
# one Spark JVM for all seeds), then diffed view-by-view
# (compare_reference.py). Usage: scripts/fidelity_sweep.sh [nSeeds]
set -e
cd "$(dirname "$0")/.."
N=${1:-20}
BASE=${FIDELITY_DIR:-/tmp/fidelity_sweep}
rm -rf "$BASE"

for i in $(seq 1 "$N"); do
  python3 scripts/gen_fixture.py "$i" "$BASE/s$i/fixtures" >/dev/null
  python3 scripts/reference_oracle.py "$BASE/s$i/fixtures" \
    "$BASE/s$i/ref" >/dev/null
done
echo "generated + reference-oracled $N seeds"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
java $ADD_OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" \
  graft.tools.FidelitySweep "$BASE" "$N" 2>/dev/null | tail -1

PASS=0
DOCPASS=0
for i in $(seq 1 "$N"); do
  if python3 scripts/compare_reference.py "$BASE/s$i/ref" \
      "$BASE/s$i/graft" >"$BASE/s$i/diff.txt" 2>&1; then
    PASS=$((PASS+1))
  else
    echo "seed $i FAILED (views):"; tail -5 "$BASE/s$i/diff.txt"
  fi
  if python3 scripts/compare_docs.py "$BASE/s$i/ref" \
      "$BASE/s$i/graft" >"$BASE/s$i/docdiff.txt" 2>&1; then
    DOCPASS=$((DOCPASS+1))
  else
    echo "seed $i FAILED (docs):"; tail -8 "$BASE/s$i/docdiff.txt"
  fi
done
echo "fidelity sweep: $PASS/$N seeds with 21/21 row-identical views," \
  "$DOCPASS/$N seeds with retrieve()-identical documents"
[ "$PASS" = "$N" ] && [ "$DOCPASS" = "$N" ]
