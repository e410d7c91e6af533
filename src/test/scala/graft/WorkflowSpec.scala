package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableCatalog
import graft.workflow.{Jobs, Pipeline}

class WorkflowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  private def tmpDir(): String =
    Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "wf").toString

  test("truncate leaves an empty table with the source schema") {
    val work = tmpDir()
    Pipeline.copyTable(spark, sf, "supplier", work,
      org.apache.spark.sql.SaveMode.Overwrite)
    Pipeline.truncate(spark, work, "supplier")
    val after = TableCatalog.load(spark, work, "supplier")
    assert(after.count() == 0)
    assert(after.columns.contains("s_suppkey"))
  }

  test("copyTable append doubles the row count") {
    val work = tmpDir()
    val n1 = Pipeline.copyTable(spark, sf, "region", work,
      org.apache.spark.sql.SaveMode.Overwrite)
    val n2 = Pipeline.copyTable(spark, sf, "region", work)
    assert(n2 == 2 * n1)
  }

  test("backupAndValidate copies exactly the main count") {
    val work = tmpDir()
    Pipeline.copyTable(spark, sf, "nation", s"$work/main",
      org.apache.spark.sql.SaveMode.Overwrite)
    val n = Pipeline.backupAndValidate(spark, s"$work/main", "nation",
      s"$work/backup")
    assert(n == TableCatalog.load(spark, s"$work/main", "nation").count())
  }

  test("loadAndVerify writes and returns the loaded count") {
    val work = tmpDir()
    val df = TableCatalog.load(spark, sf, "customer")
    val n = Pipeline.loadAndVerify(df, work, "customer_out",
      Pipeline.NoopAlerter)
    assert(n == df.count())
  }

  test("variance: reference guard prev==0 -> 0.0; symmetry of abs") {
    val prop = Prop.forAll(
      Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0L, 1000000L)) {
      (cur: Long, prev: Long) =>
        val v = Pipeline.variancePct(cur, prev)
        if (prev == 0L) v == 0.0
        else v >= 0.0 && v == math.abs(cur - prev) * 100.0 / prev
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("validateVariance rejects out-of-range thresholds") {
    intercept[IllegalArgumentException] {
      Pipeline.validateVariance(1, 1, thresholdPct = 101.0)
    }
  }

  test("conformTo selects, casts, reorders; fails loudly on missing columns") {
    import org.apache.spark.sql.types._
    val df = TableCatalog.load(spark, sf, "orders")
    val target = new StructType()
      .add("o_orderpriority", StringType)
      .add("o_orderkey", StringType) // cast long -> string
      .add("o_totalprice", DoubleType)
    val out = Pipeline.conformTo(df, target)
    assert(out.columns.toSeq ==
      Seq("o_orderpriority", "o_orderkey", "o_totalprice"))
    assert(out.schema("o_orderkey").dataType == StringType)
    intercept[IllegalArgumentException] {
      Pipeline.conformTo(df, new StructType().add("nope", StringType))
    }
  }

  test("RunJob CLI arg parsing") {
    val a = RunJob.parseArgs(Array("--job-type", "poc_etl",
      "--sf-dir", "/x", "--limit", "5"))
    assert(a == Map("job-type" -> "poc_etl", "sf-dir" -> "/x", "limit" -> "5"))
  }

  test("job registry dispatch: poc job runs, unknown type fails cleanly") {
    val registry = Jobs.builtinRegistry(tmpDir())
    val ok = Jobs.execute(spark, registry,
      Jobs.JobConfig("1", "poc_etl", "poc", "2026-01-01",
        limit = Some(10), sfDir = sf))
    assert(ok.status == "success" && ok.rowsProcessed == 10)
    val bad = Jobs.execute(spark, registry,
      Jobs.JobConfig("2", "nope", "x", "2026-01-01", sfDir = sf))
    assert(bad.status == "failed" &&
      bad.error.exists(_.contains("unknown job type")))
    val invalid = Jobs.execute(spark, registry,
      Jobs.JobConfig("", "poc_etl", "x", "2026-01-01", sfDir = sf))
    assert(invalid.status == "failed")
  }

  test("full 6-stage pipeline: first run loads, second run backs up + variance 0") {
    val work = tmpDir()
    val registry = Jobs.builtinRegistry(work)
    val cfg = Jobs.JobConfig("3", "full_etl", "full", "2026-01-01", sfDir = sf)
    val r1 = Jobs.execute(spark, registry, cfg)
    assert(r1.status == "success" && r1.rowsProcessed > 0)
    val r2 = Jobs.execute(spark, registry, cfg)
    assert(r2.status == "success")
    assert(r2.variancePct.contains(0.0))
    // backup now holds the first run's rows
    assert(TableCatalog.load(spark, s"$work/backup", "pah_out").count() ==
      r1.rowsProcessed)
  }

  test("continuous runner accumulates stats and respects stop flag") {
    val registry = Jobs.builtinRegistry(tmpDir())
    val cfg = Jobs.JobConfig("4", "poc_etl", "poc", "2026-01-01",
      limit = Some(5), sfDir = sf)
    val stats = Jobs.runContinuous(spark, registry, cfg,
      intervalMillis = 10, maxIterations = 3)
    assert(stats.iterations == 3 && stats.successes == 3)
    assert(stats.totalRows == 15)
    assert(stats.successRate == 1.0)
  }
}
