package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Parquet-directory-backed table catalog.
  *
  * The reference resolves tables dynamically against a remote warehouse
  * (JDBC `schema.table` reads, /root/reference/utils/db_utils.py:68-95) and a
  * parquet object store (/root/reference/services/s3_service.py:26-77). Here
  * the same role is played by a directory of parquet files — one per table —
  * with schema always taken from the source (parquet footer), never declared,
  * matching the reference's inferred-schema stance
  * (/root/reference/utils/db_utils.py:76-80).
  *
  * Scale note: `load` is a plain `spark.read.parquet`, so Catalyst predicate
  * pushdown / column pruning / partition pruning all apply downstream. On a
  * real cluster the directory is an object-store prefix; nothing here assumes
  * local FS.
  */
object TableCatalog {

  /** All tables the test corpus provides (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, table: String): String = s"$dir/$table.parquet"

  /** Session configs the catalog needs; Verify/Bench/tests apply them at
    * session build. `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4
    * rejects outright unless read as a raw long. */
  val requiredConfigs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Lazy scan of one table; schema from parquet footer.
    *
    * `events.ts` arrives as epoch-nanos long (see [[requiredConfigs]]) and
    * is normalized to TIMESTAMP_NTZ here. Integer `DIV` — not `/`, which
    * widens to double and loses precision above 2^53 — truncates nanos to
    * micros exactly like DuckDB's ns→µs cast, keeping the oracle aligned. */
  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    val df = spark.read.parquet(path(dir, table))
    if (table == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else df
  }

  /** Register every corpus table as a temp view so `spark.sql` works
    * (analogue of the reference's pushdown-SQL entry point,
    * /root/reference/utils/db_utils.py:97-117 — Catalyst executes instead of
    * the remote optimizer). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      load(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Existence probe via schema read — mirrors the reference's
    * probe-by-schema (/root/reference/services/s3_service.py:79-94) without
    * scanning data. */
  def exists(spark: SparkSession, dir: String, table: String): Boolean =
    try { spark.read.parquet(path(dir, table)).schema; true }
    catch { case _: Exception => false }

  /** Overwrite-write (reference parquet stage,
    * /root/reference/services/s3_service.py:26-54). */
  def write(df: DataFrame, dir: String, table: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path(dir, table))

  /** Persist as a bucketed+sorted managed table: both sides of a
    * co-partitioned equi-join then read with matching HashPartitioning and
    * the join plans with NO shuffle exchange — the storage-level answer to
    * repeated large-fact joins at 100 TB (vs paying the shuffle per query).
    * Requires `spark.sql.warehouse.dir` (set by GraftSession). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
