package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions
import graft.sources.TableCatalog

/** User-facing session factory: the single entry point a user of the
  * reference agent swaps in. Applies the catalog's required configs, the
  * engine's scale defaults (AQE on, UTC, bounded shuffle partitions —
  * mirroring the reference's session module,
  * /root/reference/core/spark.py:74-103,169-179), and installs
  * [[graft.plans.GraftExtensions]] so the native SQL functions resolve.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
    TableCatalog.requiredConfigs.foreach { case (k, v) => b.config(k, v) }
    b
  }

  /** Session + all corpus tables registered as temp views, ready for
    * `spark.sql` (the engine-side replacement for the reference's remote
    * pushdown entry point, /root/reference/utils/db_utils.py:97-117). */
  def withCatalog(dir: String, master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    TableCatalog.registerAll(spark, dir)
    spark
  }
}
