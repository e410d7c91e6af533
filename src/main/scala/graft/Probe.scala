package graft

// scratch profiling main — not part of the library surface
object Probe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    import graft.sources.TableCatalog
    val spark = GraftSession.builder("local[32]", shufflePartitions = 32,
        appName = "probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = TableCatalog.load(spark, dir, "documents")
    time("warmup")(noop(docs))

    val sh = Dedup.shingles(docs, "text", 3)
    time("1 shingles")(noop(sh))
    val postings = sh
      .select(col("doc_id"), explode(col("shingles")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gram_h"))
    time("2 postings")(noop(postings))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram_h"))
    val kept = postings.withColumn("gram_df", count(lit(1)).over(w))
    time("3 postings+window")(noop(kept))
    val a = kept.filter(col("gram_df") >= 2)
      .select(col("doc_id").as("id_a"), col("gram_h"))
    val b = kept.filter(col("gram_df") >= 2)
      .select(col("doc_id").as("id_b"), col("gram_h"))
    val pairs = a.join(b, "gram_h").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    time("4 join+group (no persist)")(noop(pairs))
    time("5 full q33")(noop(
      graft.ops.TrainingData.q33DedupNgramJaccard(spark, dir)))
    spark.catalog.clearCache()
    time("6 full q33 again")(noop(
      graft.ops.TrainingData.q33DedupNgramJaccard(spark, dir)))
    spark.stop()
  }
}
