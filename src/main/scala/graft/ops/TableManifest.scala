package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pointer tables: reader-safe in-place maintenance on plain
  * parquet — the first step toward a transaction log, sized to exactly
  * the problem [[Layout.swapInto]]'s documented caveat leaves open (a
  * reader listing the tree DURING a directory swap can see the transient
  * `._pre` sibling or a half-swapped tree, so swap-managed maintenance
  * needs a maintenance window).
  *
  * The protocol (Iceberg's versioned-snapshot idea, minimal form): data
  * lives in immutable GENERATION directories (`_gen-<seq>-<uuid>` — the
  * leading underscore hides them from direct `spark.read.parquet`
  * listing, so the only way to read the table is through the pointer),
  * and immutable, VERSIONED manifest files (`_graft_manifest-<seq>.json`)
  * name them; the current table state is the highest-seq manifest. A
  * rewrite
  *   (1) writes the next generation COMPLETELY beside the current one,
  *   (2) commits it by renaming a hidden tmp onto the next manifest
  *       VERSION — a single rename to a FRESH name, atomic everywhere
  *       (no delete-then-rename overwrite window, which Hadoop's local
  *       filesystems make observable; measured, not assumed — the
  *       rename-with-OVERWRITE draft of this file failed its own
  *       concurrency spec with missing-manifest and stale-CRC reads),
  *   (3) deletes superseded state, RETAINING the previous manifest and
  *       its generation.
  * A reader resolves the newest manifest once and reads that
  * generation's files: it sees the old table or the new table, never a
  * mix, with no coordination with writers. The one-version retention
  * keeps the state a concurrent reader resolved alive through the
  * commit that superseded it; only a reader stalled across TWO rewrites
  * can lose its generation (documented bound — a real log adds
  * time-based retention), and [[read]] re-resolves once on that race.
  *
  * Crash-safety: the manifest rename is the ONLY commit point. A crash
  * before it leaves an orphan generation and/or tmp (the newest manifest
  * still serves the old table); a crash after it leaves superseded
  * state; [[recover]] reconciles both from the same retention rule. At
  * 100 TB the manifests are single small files and generations are
  * directory metadata — the protocol adds zero data cost over the
  * rewrite itself.
  *
  * Reference analogue: the backup-before-load rollback discipline
  * (services/jcap_pa_etl_service.py:131-170) — here extended so READERS
  * are isolated from the maintenance, not just the data recoverable.
  */
object TableManifest {

  private val ManifestPrefix = "_graft_manifest-"
  private val GenPrefix = "_gen-"

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestSeq(name: String): Long =
    name.stripPrefix(ManifestPrefix).stripSuffix(".json").toLong

  /** Manifest versions present, ascending by seq. */
  private def manifestFiles(spark: SparkSession,
                            tableDir: String): Seq[Path] = {
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(e => e.isFile &&
        e.getPath.getName.startsWith(ManifestPrefix) &&
        e.getPath.getName.endsWith(".json"))
      .map(_.getPath).sortBy(p => manifestSeq(p.getName)).toSeq
  }

  private def parseGeneration(spark: SparkSession, manifest: Path): String = {
    val fs = manifest.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(manifest)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val re = """"generation"\s*:\s*"([^"]+)"""".r
    re.findFirstMatchIn(body).map(_.group(1)).getOrElse(
      throw new IllegalStateException(
        s"TableManifest: unparseable manifest at $manifest: ${body.take(200)}"))
  }

  /** The generation the newest manifest points at, if the table has been
    * published. */
  def currentGeneration(spark: SparkSession, tableDir: String): Option[String] =
    manifestFiles(spark, tableDir).lastOption
      .map(parseGeneration(spark, _))

  /** Read the table through the pointer: resolve the newest manifest
    * once, read that generation — old-or-new under any concurrent
    * rewrite, never a mix. One re-resolve covers the stalled-reader race
    * (the resolved manifest or generation was retired by TWO rewrites
    * between the resolve and the open — which surfaces as an
    * AnalysisException from the generation scan OR a
    * FileNotFoundException from the manifest open, so the retry catches
    * any non-fatal failure and lets the second attempt's error stand). */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    def resolve(): DataFrame = {
      val gen = currentGeneration(spark, tableDir).getOrElse(
        throw new IllegalArgumentException(
          s"TableManifest: no manifest at $tableDir — not a manifested " +
            "table (publish() first)"))
      spark.read.parquet(s"$tableDir/$gen")
    }
    try resolve()
    catch { case scala.util.control.NonFatal(_) => resolve() }
  }

  /** Publish `df` as the table's next generation (its first, when the
    * table is new) and commit it with the atomic manifest rename.
    * Returns the new generation's name. */
  def publish(spark: SparkSession, tableDir: String, df: DataFrame): String = {
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    fs.mkdirs(root)
    val nextSeq = manifestFiles(spark, tableDir).lastOption
      .map(p => manifestSeq(p.getName) + 1).getOrElse(1L)
    val next =
      f"$GenPrefix$nextSeq%06d-${java.util.UUID.randomUUID.toString.take(8)}"
    df.write.mode("errorifexists").parquet(s"$tableDir/$next")
    // commit: stage the new manifest hidden, then ONE rename to a fresh
    // versioned name — the only mutation a reader can ever observe
    val tmp = new Path(root, s"._manifest-${java.util.UUID.randomUUID}.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"generation":${graft.JsonEscape.str(next)}}""".getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(root, f"$ManifestPrefix$nextSeq%06d.json")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"TableManifest: commit rename $tmp -> $dst failed (concurrent " +
          "writer?)")
    // NEVER touch generations newer than this commit: another publisher
    // that listed manifests after this one may be mid-write of seq+1 —
    // deleting its uncommitted generation would let its commit point at
    // a destroyed directory. Future-seq state is only reconciled by the
    // explicit recover() (which requires no writer be active).
    cleanup(spark, tableDir, dropFutureSeq = false)
    next
  }

  /** Rewrite the table in place, reader-safely: read the current
    * generation, apply `transform`, publish the result as the next
    * generation. `transform(df).repartition(k)` is a reader-safe
    * compaction; a Z-order sort is a reader-safe re-clustering. */
  def rewrite(spark: SparkSession, tableDir: String)
             (transform: DataFrame => DataFrame): String =
    publish(spark, tableDir, transform(read(spark, tableDir)))

  /** Reconcile state after a crash: apply the retention rule (keep the
    * two newest manifests and the generations they reference) AND drop
    * future-seq orphans — generations and commit tmps a crashed publish
    * left behind with no manifest. MUST run with no writer active (an
    * in-flight publish's uncommitted generation is indistinguishable
    * from a crashed one); readers are unaffected (the newest manifest
    * never changes here). */
  def recover(spark: SparkSession, tableDir: String): Unit = {
    require(manifestFiles(spark, tableDir).nonEmpty,
      s"TableManifest: no manifest at $tableDir — nothing to recover")
    cleanup(spark, tableDir, dropFutureSeq = true)
  }

  private def genSeq(name: String): Long =
    name.stripPrefix(GenPrefix).takeWhile(_ != '-').toLong

  private def cleanup(spark: SparkSession, tableDir: String,
                      dropFutureSeq: Boolean): Unit = {
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    val ms = manifestFiles(spark, tableDir)
    val curSeq = ms.lastOption.map(p => manifestSeq(p.getName)).getOrElse(0L)
    val keepManifests = ms.takeRight(2)
    val keepGens = keepManifests.map(parseGeneration(spark, _)).toSet
    ms.dropRight(2).foreach(fs.delete(_, false))
    fs.listStatus(root).foreach { e =>
      val n = e.getPath.getName
      if (e.isDirectory && n.startsWith(GenPrefix) && !keepGens.contains(n) &&
          (dropFutureSeq || genSeq(n) <= curSeq))
        fs.delete(e.getPath, true)
      else if (dropFutureSeq && e.isFile &&
          n.startsWith("._manifest-") && n.endsWith(".tmp"))
        fs.delete(e.getPath, false)
    }
  }
}
