package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins.
  *
  * AQE's skew-join splitting (enabled by default in [[graft.GraftSession]])
  * handles most runtime skew; explicit salting remains the tool when a few
  * hot keys dominate a shuffle so badly that even split partitions overwhelm
  * single tasks (the classic power-law key problem at 100 TB). The salted
  * join keeps results identical to the plain join: the fact side gets a
  * deterministic per-row salt, the dimension side is replicated once per
  * salt value, and the join key becomes (key, salt).
  */
object Skew {

  /** Deterministic per-row salt in [0, factor): hash of the whole row's
    * columns — no RNG, so retries/speculative tasks agree. */
  private def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(factor))

  /** Inner/left equi-join with the skewed (large, hot-keyed) side salted
    * and the small side replicated `factor`×. Result rows are exactly those
    * of `skewed.join(dim, keys, joinType)`. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = skewed.withColumn("__salt", rowSalt(skewed, factor))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Diagnostic: per-key row counts over a threshold — what to look at when
    * deciding whether to salt (driver gets only the heavy hitters). */
  def heavyHitters(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc)
}
