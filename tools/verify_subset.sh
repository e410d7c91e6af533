#!/bin/bash
# verify_subset.sh <csv-qids> [sfdir] [outdir]
cd /root/repo
OPENS=""; for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
SF=${2:-/root/testdata/sf0.01}
OUT=${3:-/root/repo/target/verify_subset}
rm -rf "$OUT"
VERIFY_ONLY="$1" java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=512m \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" graft.Verify "$SF" "$OUT" 2>&1 | grep -E "\[verify\]" || true
python3 tools/check_oracle.py "$SF" "$OUT" 2>/dev/null | grep -Ei "$(echo $1 | tr ',' '|')|pass / "
