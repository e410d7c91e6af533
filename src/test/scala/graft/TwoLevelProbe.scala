package graft

import org.apache.spark.sql.functions._

/** Dev-only measurement harness (not a spec): flat vs two-level
  * nearest-centroid assignment past the FlatScanMax threshold — the
  * evidence behind the round-6 ivfAutoK ceiling raise. Run with
  * `Test/runMain graft.TwoLevelProbe`. */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32, "probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = 64
    val n = 200000
    val vecs = spark.range(n).select(col("id"),
        transform(sequence(lit(1), lit(d)),
          i => sin((col("id") + 1) * i * 0.7)).as("emb"))
      .localCheckpoint()
    val k = 4096
    val rnd = new scala.util.Random(11)
    val centEmbs = Array.fill(k)(Array.fill(d)(rnd.nextGaussian()))
    val centIds = Array.tabulate(k)(_.toLong)
    def run(flatMax: Int, label: String): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        vecs.select(element_at(
            graft.ops.Similarity.nearestCells(col("emb"), centIds, centEmbs,
              1, flatMax = flatMax), 1).as("cell"))
          .groupBy("cell").count()
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${ts.min}%.2f all " +
        ts.map(t => f"$t%.2f").mkString(","))
    }
    run(Int.MaxValue, "flat_k4096")
    run(0, "twolevel_k4096")
    spark.stop()
  }
}
