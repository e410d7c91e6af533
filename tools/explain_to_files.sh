#!/bin/bash
# Dump .explain("formatted") per query into plans/r13/<qid>_<suffix>.txt
# usage: explain_to_files.sh <suffix> <qid> [qid...]
set -e
cd /root/repo
SUFFIX=$1; shift
OPENS=""; for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=512m \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" graft.Explain /root/testdata/sf0.01 "$@" 2>/dev/null \
  | awk -v suf="$SUFFIX" '
    /^========== / { q=$2; f="plans/r13/" q "_" suf ".txt"; next }
    q != "" { print > f }
  '
