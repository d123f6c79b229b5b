#!/bin/bash
# Dev loop: compile, run graft.Verify at a small SF, self-check vs DuckDB.
# Usage: scripts/verify.sh [sfDir] [outDir]
set -e
# pipefail: graft.Verify now exits non-zero when any query throws —
# without this the `| grep | tail` pipeline would swallow that signal
set -o pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/verify_out}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "$CP" graft.Verify "$SF" "$OUT" 2>&1 | grep -v '^\s*$' | tail -5
python3 scripts/selfcheck.py "$SF" "$OUT"
# px10's deflate census has no SQL oracle — its two-sided check is the
# CPython-zlib twin (same madler zlib as the JDK's Deflater)
python3 scripts/compare_deflate.py "$SF" "$OUT"
