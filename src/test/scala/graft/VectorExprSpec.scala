package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{dot, dotHof}
import graft.sources.TableCatalog

class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native DotProduct is byte-identical to the HOF formulation") {
    val emb = TableCatalog.load(spark, TestSpark.sfDir, "embeddings")
    val a = emb.select(col("vec_id"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id"), col("embedding").as("eb"))
    val diff = a.join(b, "vec_id")
      .select(dot(col("ea"), col("eb")).as("native"),
        dotHof(col("ea"), col("eb")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0, s"$diff rows differ between native and HOF dot")
  }

  test("graft_dot / graft_cosine resolve in SQL via GraftExtensions") {
    TableCatalog.registerAll(spark, TestSpark.sfDir)
    val row = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                 CAST(embedding AS ARRAY<DOUBLE>)) AS d,
        |       graft_cosine(CAST(embedding AS ARRAY<DOUBLE>),
        |                    CAST(embedding AS ARRAY<DOUBLE>)) AS c
        |FROM embeddings WHERE vec_id = 0""".stripMargin).head()
    assert(row.getDouble(0) > 0.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
  }

  test("text expressions resolve in SQL via GraftExtensions") {
    TableCatalog.registerAll(spark, TestSpark.sfDir)
    val row = spark.sql(
      """SELECT graft_word_tokens(text) AS toks,
        |       graft_word_ngrams(text, 3) AS grams,
        |       graft_minhashes(graft_word_ngrams(text, 3), 4) AS mins,
        |       graft_simhash64(graft_word_tokens(text)) AS sig
        |FROM documents WHERE doc_id = 0""".stripMargin).head()
    assert(row.getSeq[String](0).nonEmpty)
    assert(row.getSeq[String](1).nonEmpty)
    assert(row.getSeq[Long](2).length == 4)
    // and the SQL surface agrees with the Column API
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash64(graft_word_tokens(text)) AS s " +
        "FROM documents").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = graft.ops.Dedup.simhash64(
        TableCatalog.load(spark, TestSpark.sfDir, "documents"),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaApi.forall { case (k, v) => viaSql(k) == v })
  }

  test("graft_deletion_neighbors / graft_cms_estimate resolve in SQL") {
    TableCatalog.registerAll(spark, TestSpark.sfDir)
    val v = spark.sql("SELECT graft_deletion_neighbors('abc') AS v").head()
      .getSeq[String](0)
    assert(v == Seq("abc", "bc", "ac", "ab"))
    // CMS probe end-to-end in SQL: the sketch arrives as a scalar
    // subquery, which Catalyst folds to a literal the probe can cache
    val est = spark.sql(
      """SELECT l_partkey,
        |       graft_cms_estimate(
        |         (SELECT count_min_sketch(l_partkey, 0.001d, 0.99d, 7)
        |          FROM lineitem), l_partkey) AS est
        |FROM lineitem LIMIT 5""".stripMargin).collect()
    assert(est.forall(_.getLong(1) >= 1L))
  }

  test("null array elements hash like Spark's null-skipping, no NPE") {
    // xxhash64 skips null inputs: xxhash64(s, NULL) == xxhash64(s), so the
    // null element must contribute exactly the bare per-seed hash
    val row = spark.sql(
      """SELECT graft_minhashes(array('a', CAST(NULL AS STRING)), 2) AS m,
        |       graft_simhash64(array('a', CAST(NULL AS STRING))) AS s,
        |       array(least(xxhash64(0, 'a'), xxhash64(0, CAST(NULL AS STRING))),
        |             least(xxhash64(1, 'a'), xxhash64(1, CAST(NULL AS STRING))))
        |         AS expected_m,
        |       xxhash64('a') AS ha,
        |       xxhash64(CAST(NULL AS STRING)) AS hnull""".stripMargin).head()
    assert(row.getSeq[Long](0) == row.getSeq[Long](2),
      s"minhashes ${row.getSeq[Long](0)} != expected ${row.getSeq[Long](2)}")
    def sigOf(hs: Seq[Long]): Long = (0 until 64).map { b =>
      val votes = hs.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
      if (votes > 0) 1L << b else 0L
    }.sum
    assert(row.getLong(1) == sigOf(Seq(row.getLong(3), row.getLong(4))),
      "simhash must equal the per-bit vote over (hash('a'), hash(NULL))")
  }

  test("null array propagates to null dot") {
    val df = spark.sql(
      "SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1.0d, 2.0d) AS b")
    assert(df.select(dot(col("a"), col("b"))).head().isNullAt(0))
  }
}
