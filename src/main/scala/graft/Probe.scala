package graft

/** Scratch profiling main: runs registered queries through the noop sink
  * with per-query timing. PROBE_TARGET picks the query to repeat (3 runs);
  * predecessors in sorted order run first unless PROBE_ONLY is set.
  * Diagnostic tool only — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", shufflePartitions = 32,
        appName = "probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val target = sys.env.getOrElse("PROBE_TARGET", "q35_embedding_neardup")
    val names =
      if (sys.env.contains("PROBE_ONLY")) Seq.empty
      else SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ != target)
    names.foreach { n =>
      time(n)(SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    // time the same form the bench times: the benchForm override where
    // one exists (maintenance rows template-copy their fixture there,
    // so the probe measures the operator, not the fixture write)
    val form = SparkEntry.benchForm.getOrElse(target,
      SparkEntry.queries(target))
    (1 to 3).foreach { i =>
      time(s"TARGET $target run $i")(
        form(spark, dir)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
