#!/bin/bash
cd /root/repo
OPENS=""; for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=512m \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" graft.Diag "$1" 2>/dev/null
