/** The ONE private[sql] doorway graft's V1 streaming source needs —
  * placed under `org.apache.spark.sql` so it can see `Dataset.ofRows`
  * (the standard extension-point technique for Spark connector shims;
  * everything else in graft lives in the `graft` namespace and uses
  * only public API).
  *
  * Why it exists: a V1 [[org.apache.spark.sql.execution.streaming.Source]]'s
  * `getBatch` must return a DataFrame whose logical plan is marked
  * `isStreaming = true` — MicroBatchExecution asserts it — but the
  * whole POINT of graft's manifest source is that a micro-batch IS a
  * plain Catalyst parquet scan over the new generations (vectorized
  * reader, pushdown, codegen — everything a hand-rolled DSv2
  * PartitionReader would forfeit). This shim re-marks the scan's leaf
  * relations streaming without touching anything else. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

object StreamingBatchShim {

  /** `df`, re-planned with every leaf relation marked streaming — the
    * shape MicroBatchExecution requires from a V1 `getBatch`. Covers
    * the two leaves a manifest micro-batch can produce: the parquet
    * scan over new generations ([[LogicalRelation]]) and the empty
    * schema-only frame a watermark-only version window yields
    * ([[LocalRelation]]). */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val classicDf = df.asInstanceOf[Dataset[Row]]
    val plan = classicDf.queryExecution.analyzed.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case loc: LocalRelation => loc.copy(isStreaming = true)
    }
    Dataset.ofRows(classicDf.sparkSession, plan)
  }
}
