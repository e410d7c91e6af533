package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Analytics, Relational}

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("every declared query runs and is non-degenerate") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      // empty is only legitimate for the truncate query
      if (name != "q16_truncate_empty")
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key refers to a declared query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("flagship left joins preserve unmatched fact rows with nulls") {
    val df = Relational.q03FlagshipSql(spark, sf)
    // rows whose linestatus never matches an orderstatus keep null dims
    val unmatched = df.filter(col("priority_uc").isNull)
    assert(unmatched.count() > 0, "expected some unmatched left-join rows")
    // and their CASE fall-through column is null only when no arm matched
    val fallThrough =
      df.filter(col("final_disposition").isNull)
    // A/R rows always match an arm, so fall-through requires flag N –
    // impossible here since the filter keeps only A/R: expect zero
    assert(fallThrough.count() == 0)
  }

  test("q06 CASE without ELSE falls through to NULL") {
    val tags = Relational.q06CaseWhen(spark, sf)
    val nulls = tags.filter(col("tag").isNull).count()
    assert(nulls > 0, "expected NULL fall-through rows")
  }

  test("q16 truncate keeps schema with zero rows") {
    val df = Relational.q16TruncateEmpty(spark, sf)
    assert(df.count() == 0)
    assert(df.columns.toSeq ==
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
  }

  test("q18 variance matches hand computation") {
    val Row(cur: Long, prev: Long, v: Double) =
      Relational.q18CountVariance(spark, sf).head()
    assert(v == math.abs(cur - prev) * 100.0 / prev)
  }

  test("q27 approx distinct within 5% of exact (envelope boolean TRUE)") {
    val rows = Analytics.q27ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach {
      case Row(flag, exact: Long, ok: Boolean) =>
        assert(exact > 0L && ok, s"flag $flag exact $exact est_ok $ok")
    }
  }

  test("q30 rollup includes grand total equal to table count") {
    val total = Analytics.q30Rollup(spark, sf)
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .select("n").head().getLong(0)
    assert(total ==
      graft.sources.TableCatalog.load(spark, sf, "lineitem").count())
  }

  test("q200 SQL surface: the pure-SQL top-k agrees row-for-row with " +
      "the Column-API brute force — same Catalyst, two front doors") {
    val out = graft.ops.Relational.q200SqlSurface(spark, sf).collect()
    assert(out.length == 15, out.length.toString)
    val sqlTop = out.map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getLong(3))).toSeq
    val emb = graft.sources.TableCatalog.load(spark, sf, "embeddings")
    val api = graft.ops.Similarity.bruteForceTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 5),
        idCol = "vec_id", embCol = "embedding", k = 3)
      .orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(sqlTop == api, s"\nsql: $sqlTop\napi: $api")
  }
}
