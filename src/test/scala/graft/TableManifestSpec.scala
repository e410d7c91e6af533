package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableManifest

class TableManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpTable(prefix: String): String =
    Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), prefix).toString + "/t"

  test("publish/read round-trips; rewrite advances the pointer and " +
      "retains exactly the previous generation; direct reads of the " +
      "table dir cannot double-count generations") {
    import spark.implicits._
    val tbl = tmpTable("manif")
    val g1 = TableManifest.publish(spark, tbl,
      (0 until 100).map(i => (i.toLong, "v1")).toDF("id", "tag"))
    assert(TableManifest.currentGeneration(spark, tbl).contains(g1))
    assert(TableManifest.read(spark, tbl).count() == 100)
    val g2 = TableManifest.rewrite(spark, tbl)(df =>
      df.withColumn("tag", lit("v2")).repartition(2))
    val g3 = TableManifest.rewrite(spark, tbl)(df =>
      df.withColumn("tag", lit("v3")))
    assert(TableManifest.read(spark, tbl)
      .select("tag").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("v3"))
    // retention: current + previous generation only — g1 is gone, g2 (the
    // one a concurrent reader may still hold) survives
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(tbl))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(gens == Set(g2, g3), gens.toString)
    // generation dirs are hidden from direct listing: reading the TABLE
    // dir (instead of through the pointer) fails loudly rather than
    // silently unioning generations
    intercept[Exception] { spark.read.parquet(tbl).collect() }
  }

  test("a reader iterating DURING rewrites sees exactly one whole " +
      "generation — old or new, never a mix, never a missing tree") {
    import spark.implicits._
    val tbl = tmpTable("manifrace")
    def gen(tag: String) =
      (0 until 500).map(i => (i.toLong, tag)).toDF("id", "tag")
    TableManifest.publish(spark, tbl, gen("v0"))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val r = TableManifest.read(spark, tbl)
            .agg(count(lit(1)), countDistinct(col("tag"))).head
          if (r.getLong(0) != 500L || r.getLong(1) != 1L)
            violations.add(s"torn read: ${r.toString}")
          reads.incrementAndGet()
        } catch {
          case e: Throwable => violations.add(s"read failed: $e")
        }
      }
    })
    reader.start()
    try {
      // each rewrite is a full old→new transition under the reader; the
      // writer waits for reader progress between swaps so every swap is
      // actually observed (and a stalled-reader generation is never two
      // rewrites behind — the retention contract's bound)
      (1 to 5).foreach { v =>
        val before = reads.get()
        TableManifest.rewrite(spark, tbl)(df =>
          df.withColumn("tag", lit(s"v$v")))
        val deadline = System.nanoTime() + 30L * 1000000000L
        while (reads.get() == before && System.nanoTime() < deadline)
          Thread.sleep(10)
        assert(reads.get() > before, "reader made no progress")
      }
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    assert(violations.isEmpty, violations.toArray.mkString("; "))
    assert(TableManifest.read(spark, tbl)
      .select("tag").distinct().head.getString(0) == "v5")
  }

  test("recover reconciles crash debris: orphan next-generations and " +
      "stale manifest tmps are dropped, the pointer never moves") {
    import spark.implicits._
    val tbl = tmpTable("manifrec")
    TableManifest.publish(spark, tbl,
      (0 until 50).map(i => (i.toLong, "v1")).toDF("id", "tag"))
    val g2 = TableManifest.rewrite(spark, tbl)(df =>
      df.withColumn("tag", lit("v2")))
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // crash BEFORE the commit point: a fully-written orphan generation
    // and a stale manifest tmp — the manifest still serves v2
    (0 until 50).map(i => (i.toLong, "orphan")).toDF("id", "tag")
      .write.parquet(s"$tbl/_gen-000099-deadbeef")
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$tbl/._manifest-crashed.tmp"), true)
    out.write("{}".getBytes("UTF-8")); out.close()
    assert(TableManifest.read(spark, tbl)
      .select("tag").distinct().head.getString(0) == "v2",
      "a crashed publish must be invisible to readers")
    // a ROUTINE publish must NOT reap the future-seq generation: it is
    // indistinguishable from another publisher's in-flight write —
    // only the explicit recover() (no-writer contract) may drop it
    val g3 = TableManifest.rewrite(spark, tbl)(df => df)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$tbl/_gen-000099-deadbeef")),
      "publish must never delete a future-seq (possibly in-flight) gen")
    TableManifest.recover(spark, tbl)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(tbl))
      .map(_.getPath.getName).toSet
    assert(!names.contains("_gen-000099-deadbeef"),
      s"orphan generation must be reconciled: $names")
    assert(!names.exists(_.startsWith("._manifest-")),
      s"stale manifest tmp must be dropped: $names")
    assert(names.contains(g2) && names.contains(g3),
      s"retention must keep current + previous: $names")
    assert(TableManifest.currentGeneration(spark, tbl).contains(g3))
    assert(TableManifest.read(spark, tbl).count() == 50)
  }
}
