package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, Audit, Corpus, Insights, Mining, Relational, Stats, Temporal, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by operator tier (graft.ops.*); each tier exposes
  * a `queries` registry (name → (session, sfDir) → DataFrame) and an
  * `oracle` registry (name → DuckDB SQL). Non-SQL-expressible or
  * nondeterministic queries have no oracle entry and get the driver's
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03FlagshipSql(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Analytics.queries ++ TrainingData.queries ++
      Temporal.queries ++ Corpus.queries ++ Insights.queries ++
      Stats.queries ++ Mining.queries ++ Audit.queries ++
      graft.streaming.Streams.queries

  /** Bench-form overrides: queries whose REGISTERED form carries an
    * exact-side audit so the oracle can envelope-check an approximate
    * operator (q70's exact percentiles beside the sketch, the ANN
    * queries' brute-force recall side). Correctness (`Verify`) always
    * runs the registered/audited form; the benchmark times the
    * production projection from this map instead, so the recorded cost
    * is the operator's, not its reference's. Keys must be a subset of
    * [[queries]] keys. */
  def benchForm: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.benchForm ++ TrainingData.benchForm ++ Mining.benchForm ++
      Audit.benchForm

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Analytics.oracle ++ TrainingData.oracle ++
      Temporal.oracle ++ Corpus.oracle ++ Insights.oracle ++
      Stats.oracle ++ Mining.oracle ++ Audit.oracle ++
      graft.streaming.Streams.oracle
}
