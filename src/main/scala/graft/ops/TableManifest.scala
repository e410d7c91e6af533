package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pointer tables: reader-safe in-place maintenance on plain
  * parquet — a minimal transaction log, sized to exactly the problem
  * [[Layout.swapInto]]'s documented caveat leaves open (a reader listing
  * the tree DURING a directory swap can see the transient `._pre`
  * sibling or a half-swapped tree, so swap-managed maintenance needs a
  * maintenance window).
  *
  * The protocol (Iceberg's versioned-snapshot idea, minimal form): data
  * lives in immutable GENERATION directories (`_gen-<seq>-<uuid>` — the
  * leading underscore hides them from direct `spark.read.parquet`
  * listing, so the only way to read the table is through the pointer),
  * and immutable, VERSIONED manifest files (`_graft_manifest-<seq>.json`)
  * name the generation SET that makes up the table at that version; the
  * current table state is the highest-seq manifest. A full rewrite
  *   (1) writes the next generation COMPLETELY beside the current ones,
  *   (2) commits it by PUBLISHING a hidden, fully-written tmp under the
  *       next manifest VERSION's name with an atomic fail-if-exists
  *       primitive (hard link locally, no-overwrite FileContext rename
  *       on HDFS — see [[commitSnapshot]]; measured, not assumed: both
  *       the rename-with-OVERWRITE and the plain FileSystem.rename
  *       drafts of this file failed their own concurrency specs, the
  *       first with missing-manifest and stale-CRC reads, the second
  *       with two racing appenders both "winning" one seq),
  *   (3) vacuums superseded DATA generations, retaining the previous
  *       version's — the manifest log itself is permanent (tiny JSON
  *       per commit; deleting old manifests would free their seqs for
  *       re-claim and turn the commit CAS into ABA — see [[vacuum]]).
  * An APPEND ([[append]]) writes ONLY the new rows as one more
  * generation and commits a manifest listing `current ++ new` — O(batch)
  * data cost per commit, never a table rewrite. The fresh-name rename
  * doubles as a compare-and-swap: two writers that based their commit on
  * the same version race for the same next seq, exactly one rename
  * succeeds, and the loser REBASES (re-reads the winner's manifest,
  * re-commits `winner's generations ++ its own already-written
  * generation`) — no lost update, no data rewrite on retry.
  *
  * Exactly-once ingest: a commit may carry a BATCH WATERMARK (`"batch"`
  * in the manifest). [[append]] with a batch id skips committing when
  * the current watermark already covers it — a Structured Streaming
  * `foreachBatch` replay after a crash re-offers the last batch with the
  * same id and lands exactly once ([[streamingSink]]). [[publish]] and
  * [[rewrite]] CARRY the watermark forward, so a compaction between
  * batches cannot reset idempotence and let a replay double-append.
  *
  * A reader resolves the newest manifest once and reads that version's
  * generation set: it sees the old table or the new table, never a mix,
  * with no coordination with writers. Retention keeps the previous
  * manifest and its generations alive through the commit that superseded
  * them; [[readVersion]] reads a retained older version explicitly (time
  * travel, bounded by the retention window). Only a reader stalled
  * across TWO commits can lose its generation set (documented bound — a
  * bigger log adds time-based retention), and [[read]] re-resolves once
  * on that race.
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

  /** One committed table version: the generation set that makes up the
    * table at that version and the exactly-once batch watermark. */
  private case class Snapshot(generations: Seq[String], batch: Option[Long])

  /** [[parseSnapshot]] tolerant of the one mutation the permanent log
    * allows — [[truncateLog]] deleting an OLD manifest between a
    * walker's listing and its open. Returns None exactly then; any
    * other failure (unparseable body, IO error on a present file)
    * still throws. */
  private def parseSnapshotIfPresent(spark: SparkSession,
                                     manifest: Path): Option[Snapshot] =
    try Some(parseSnapshot(spark, manifest))
    catch { case _: java.io.FileNotFoundException => None }

  /** Parse a manifest body. Two wire forms, both emitted by this file's
    * history: `{"generation":"g"}` (single, the r10 original) and
    * `{"generations":["g1","g2"],"batch":7}` (set + watermark). */
  private def parseSnapshot(spark: SparkSession, manifest: Path): Snapshot = {
    val fs = manifest.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(manifest)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val many = """"generations"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(body).map { m =>
        """"([^"]+)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      }
    val one = """"generation"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(body).map(m => Seq(m.group(1)))
    val batch = """"batch"\s*:\s*(-?\d+)""".r
      .findFirstMatchIn(body).map(_.group(1).toLong)
    Snapshot(many.orElse(one).getOrElse(
      throw new IllegalStateException(
        s"TableManifest: unparseable manifest at $manifest: " +
          body.take(200))), batch)
  }

  private def renderSnapshot(s: Snapshot): String = {
    val gens = s.generations.map(graft.JsonEscape.str).mkString("[", ",", "]")
    val batch = s.batch.map(b => s""","batch":$b""").getOrElse("")
    s"""{"generations":$gens$batch}"""
  }

  private def newestSnapshot(spark: SparkSession,
                             tableDir: String): Option[(Long, Snapshot)] =
    manifestFiles(spark, tableDir).lastOption.map(p =>
      (manifestSeq(p.getName), parseSnapshot(spark, p)))

  /** The generations the newest manifest points at, if the table has
    * been published (one element until the first [[append]]). */
  def currentGenerations(spark: SparkSession,
                         tableDir: String): Seq[String] =
    newestSnapshot(spark, tableDir).map(_._2.generations).getOrElse(Seq.empty)

  /** The single generation the newest manifest points at — the
    * pre-append API, kept for single-generation tables ([[publish]] /
    * [[rewrite]] commits). */
  def currentGeneration(spark: SparkSession,
                        tableDir: String): Option[String] =
    currentGenerations(spark, tableDir) match {
      case Seq(one) => Some(one)
      case Seq()    => None
      case many => throw new IllegalStateException(
        s"TableManifest: $tableDir holds ${many.size} generations " +
          "(appended table) — use currentGenerations")
    }

  /** The exactly-once batch watermark: the highest batch id a commit has
    * recorded. [[append]] with a batch id at or below it is a replay. */
  def lastBatchId(spark: SparkSession, tableDir: String): Option[Long] =
    newestSnapshot(spark, tableDir).flatMap(_._2.batch)

  /** The guaranteed-readable version window, ascending: the contiguous
    * HEAD suffix of the permanent manifest log whose data is still fully
    * present. The walk runs newest-first with memoized existence checks
    * and stops at the first version missing a generation, so the cost is
    * O(window), not O(all commits × their generation lists) — on a
    * long-lived streaming table the log holds one manifest per commit
    * and each append-chain manifest lists every prior generation, which
    * would make the naive full scan quadratic in table age.
    *
    * Append-chain versions share their generations with the head and
    * stay in the window deep into history; a rewrite (compaction) cuts
    * it to the version it superseded. Versions BELOW the window may
    * still read successfully through [[readVersion]] when the vacuum's
    * early-stop left their generations behind (a documented disk-leak
    * bound, reclaimed by [[recover]]) — the window is the guarantee,
    * not the inventory. */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val fs = fsOf(spark, tableDir)
    val alive = scala.collection.mutable.Map.empty[String, Boolean]
    manifestFiles(spark, tableDir).reverseIterator
      .map(m => (manifestSeq(m.getName),
        parseSnapshotIfPresent(spark, m))) // truncated mid-walk = window end
      .takeWhile(_._2.exists(_.generations.forall(g =>
        alive.getOrElseUpdate(g, fs.exists(new Path(s"$tableDir/$g"))))))
      .map(_._1).toSeq.reverse
  }

  /** Read the table through the pointer: resolve the newest manifest
    * once, read that version's generation set — old-or-new under any
    * concurrent commit, never a mix. One re-resolve covers the
    * stalled-reader race (the resolved manifest or generations were
    * retired by TWO commits between the resolve and the open — which
    * surfaces as an AnalysisException from the generation scan OR a
    * FileNotFoundException from the manifest open, so the retry catches
    * any non-fatal failure and lets the second attempt's error stand). */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    def resolve(): DataFrame = {
      val gens = currentGenerations(spark, tableDir)
      if (gens.isEmpty) throw new IllegalArgumentException(
        s"TableManifest: no manifest at $tableDir — not a manifested " +
          "table (publish() first)")
      spark.read.parquet(gens.map(g => s"$tableDir/$g"): _*)
    }
    try resolve()
    catch { case scala.util.control.NonFatal(_) => resolve() }
  }

  /** Time travel: read a RETAINED committed version (see [[versions]]).
    * Retention keeps the newest two, so the version a rewrite or append
    * just superseded stays readable — enough to diff a maintenance pass
    * or audit an ingest commit; a longer window is a retention knob, not
    * a protocol change. */
  def readVersion(spark: SparkSession, tableDir: String,
                  version: Long): DataFrame = {
    val fs = fsOf(spark, tableDir)
    val gens = manifestFiles(spark, tableDir)
      .find(p => manifestSeq(p.getName) == version)
      .flatMap(parseSnapshotIfPresent(spark, _)) // truncated between
      .map(_.generations)                        // listing and open
      .filter(_.forall(g => fs.exists(new Path(s"$tableDir/$g"))))
      .getOrElse(throw new IllegalArgumentException(
        s"TableManifest: version $version not retained at $tableDir — " +
          "never committed, truncated, or its data was vacuumed " +
          s"(retained: ${versions(spark, tableDir).mkString(",")})"))
    spark.read.parquet(gens.map(g => s"$tableDir/$g"): _*)
  }

  /** Write `df` as one complete new generation directory (not yet
    * referenced by any manifest) and return its name, seq-stamped from
    * the caller's intended commit seq. */
  private def writeGeneration(spark: SparkSession, tableDir: String,
                              seq: Long, df: DataFrame): String = {
    val next =
      f"$GenPrefix$seq%06d-${java.util.UUID.randomUUID.toString.take(8)}"
    df.write.mode("errorifexists").parquet(s"$tableDir/$next")
    next
  }

  /** Stage-then-publish commit of `snapshot` as version `seq`: returns
    * false when the seq is lost to a concurrent writer (the CAS failure
    * — caller rebases and retries on a fresh seq).
    *
    * The publication primitive must be ATOMIC FAIL-IF-EXISTS — plain
    * `FileSystem.rename` is NOT it on local filesystems (POSIX rename(2)
    * silently REPLACES an existing destination, so two writers racing
    * for the same seq would both "succeed" and the first commit's
    * batches would vanish; this file's own concurrency spec caught
    * exactly that). So:
    *   - local paths: a HARD LINK of the fully-written tmp onto the
    *     versioned name — link(2) fails with EEXIST atomically in the
    *     kernel, and the destination appears with its complete content
    *     in the same syscall;
    *   - non-local paths: `FileContext.rename` WITHOUT the OVERWRITE
    *     option — atomic with the existence check on HDFS (one NameNode
    *     op), and the same primitive Spark's HDFSMetadataLog trusts for
    *     its streaming commit log. */
  private def commitSnapshot(spark: SparkSession, tableDir: String,
                             seq: Long, snapshot: Snapshot): Boolean = {
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    val tmp = new Path(root, s"._manifest-${java.util.UUID.randomUUID}.tmp")
    val out = fs.create(tmp, true)
    try out.write(renderSnapshot(snapshot).getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(root, f"$ManifestPrefix$seq%06d.json")
    val scheme = fs.getUri.getScheme
    val won =
      if (scheme == null || scheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else if (scheme == "hdfs" || scheme == "viewfs") {
        try {
          org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri, spark.sessionState.newHadoopConf())
            .rename(tmp, dst) // default = no overwrite; one NameNode op
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: java.io.IOException
              if e.getMessage != null &&
                e.getMessage.contains("already exists") => false
        }
      } else {
        // Object stores are NOT certified: s3a has no AbstractFileSystem
        // binding by default (FileContext.getFileContext throws), and
        // stores that emulate rename as copy+delete behind a client-side
        // existence check (gs, wasb without hierarchical namespace) give
        // two racing writers the same seq — the exact lost update the
        // local hard-link path exists to prevent. Refuse loudly instead
        // of committing on an assumption.
        fs.delete(tmp, false)
        throw new UnsupportedOperationException(
          s"TableManifest: no certified atomic fail-if-exists commit " +
            s"primitive for scheme '$scheme' (certified: file via " +
            "hard link, hdfs/viewfs via no-overwrite FileContext " +
            "rename). Commit through a certified filesystem, or extend " +
            "commitSnapshot with this store's conditional-put primitive.")
      }
    fs.delete(tmp, false) // staged copy (CAS won: dst holds the content)
    won
  }

  private def manifestPath(tableDir: String, seq: Long): Path =
    new Path(tableDir, f"$ManifestPrefix$seq%06d.json")

  /** Publish `df` as the table's next version, REPLACING the current
    * generation set (its first version, when the table is new). The
    * exactly-once batch watermark carries forward — compacting between
    * ingest batches must not re-open the door to a replay. Returns the
    * new generation's name.
    *
    * Concurrency: REPLACE racing a concurrent commit is a LOGICAL
    * conflict (which rows should the head hold?), so a lost CAS deletes
    * this call's staged generation and fails loudly — the table is
    * unchanged, the caller re-runs against the new head. A silent rebase
    * here would drop the concurrent append's rows while carrying its
    * watermark, suppressing the exactly-once replay: the one loss this
    * log exists to prevent. For transforms DERIVED from the current
    * table (compaction, re-clustering), use [[rewrite]] — it re-derives
    * from the new head and can therefore retry safely. */
  def publish(spark: SparkSession, tableDir: String, df: DataFrame): String = {
    val fs = fsOf(spark, tableDir)
    fs.mkdirs(new Path(tableDir))
    val ms = manifestFiles(spark, tableDir)
    val cur = ms.lastOption.map(p =>
      (manifestSeq(p.getName), parseSnapshot(spark, p)))
    val nextSeq = cur.map(_._1 + 1).getOrElse(1L)
    val next = writeGeneration(spark, tableDir, nextSeq, df)
    val snap = Snapshot(Seq(next), cur.flatMap(_._2.batch))
    if (!commitSnapshot(spark, tableDir, nextSeq, snap)) {
      fs.delete(new Path(s"$tableDir/$next"), true) // ours, unreferenced
      throw new java.io.IOException(
        s"TableManifest: publish of version $nextSeq at $tableDir lost " +
          "to a concurrent commit — the table is UNCHANGED by this call " +
          "(REPLACE vs a concurrent append is a logical conflict; " +
          "re-run against the new head, or use rewrite() for " +
          "table-derived transforms, which retries safely)")
    }
    vacuum(spark, tableDir, ms :+ manifestPath(tableDir, nextSeq),
      keepGens = cur.map(_._2.generations).getOrElse(Seq.empty).toSet + next,
      dropFutureSeq = false)
    next
  }

  /** Append `df` as one more generation — O(batch) data cost, the table
    * is never rewritten. Returns the committed generation's name, or
    * None when `batchId` is a replay the watermark already covers
    * (exactly-once ingest: nothing is written, nothing committed —
    * under the single-writer watermark contract on [[rewriteBatch]]:
    * one global monotone id per table, so a rebuilt checkpoint's
    * restarted ids silently skip until they pass the old watermark).
    *
    * Concurrency: the fail-if-exists commit is a compare-and-swap — on a
    * lost race the append REBASES (re-reads the winner's generation set,
    * re-commits `winner ++ ours` on the next seq) without touching its
    * already-written data. Appends commute, so the rebase is always
    * safe. `maxRetries` bounds pathological writer storms; a single
    * streaming writer never retries. One manifest listing serves the
    * precondition, the CAS base, and the winner's vacuum — the log is
    * permanent, so listings grow with table age and are not free. */
  def append(spark: SparkSession, tableDir: String, df: DataFrame,
             batchId: Option[Long] = None,
             maxRetries: Int = 5): Option[String] = {
    def covered(s: Snapshot): Boolean =
      batchId.exists(b => s.batch.exists(_ >= b))
    var ms = manifestFiles(spark, tableDir)
    require(ms.nonEmpty,
      s"TableManifest: no manifest at $tableDir — publish() the table " +
        "before appending")
    def newestOf(l: Seq[Path]): (Long, Snapshot) =
      (manifestSeq(l.last.getName), parseSnapshot(spark, l.last))
    var base = newestOf(ms)
    if (covered(base._2)) return None // replay: skip before writing
    val gen = writeGeneration(spark, tableDir, base._1 + 1, df)
    var attempts = 0
    while (attempts <= maxRetries) {
      val (seq, snap) = base
      if (covered(snap)) {
        // a concurrent commit of this very batch won while we wrote —
        // our generation is unreferenced by construction, drop it
        fsOf(spark, tableDir).delete(new Path(s"$tableDir/$gen"), true)
        return None
      }
      val merged = Snapshot(snap.generations :+ gen,
        (snap.batch.toSeq ++ batchId.toSeq).maxOption)
      attempts += 1
      if (commitSnapshot(spark, tableDir, seq + 1, merged)) {
        vacuum(spark, tableDir, ms :+ manifestPath(tableDir, seq + 1),
          keepGens = merged.generations.toSet, dropFutureSeq = false)
        return Some(gen)
      }
      ms = manifestFiles(spark, tableDir) // rebase on the winner
      base = newestOf(ms)
    }
    throw new java.io.IOException(
      s"TableManifest: append at $tableDir lost the commit race on all " +
        s"$attempts attempts — writer storm? (orphan generation $gen " +
        "left for recover())")
  }

  /** Rewrite the table in place, reader-safely: read the current
    * generation set, apply `transform`, commit the result as the next
    * version (collapsing an appended table back to ONE generation —
    * manifest-log compaction). `transform(df).repartition(k)` is a
    * reader-safe compaction; a Z-order sort is a reader-safe
    * re-clustering.
    *
    * Concurrency: the version read and the CAS base are THE SAME
    * snapshot — resolving the data and then committing against a
    * re-read head would let an append land in the gap and vanish from
    * the rewritten table while its watermark carried forward (the
    * silent-loss TOCTOU a review of this file caught). On a lost race
    * the stale transform result is DELETED and the whole
    * read→transform→commit cycle re-runs against the new head — safe
    * because the transform re-derives from whatever it reads, so the
    * interleaved commit's rows flow into the retry. A transient write
    * failure (e.g. the base generation vacuumed mid-read by two faster
    * rewrites) retries the same way; `maxRetries` bounds the loop. */
  def rewrite(spark: SparkSession, tableDir: String, maxRetries: Int = 3)
             (transform: DataFrame => DataFrame): String =
    rewriteBatch(spark, tableDir, batchId = None, maxRetries)(transform)
      .get // never a replay without a batch id

  /** [[rewrite]] carrying an exactly-once batch watermark — the REPLACE
    * half of what [[append]]'s `batchId` is to the add half: a
    * `foreachBatch` sink whose batches MERGE into the table (CDC
    * upsert) rewrites it per batch, and a replay after a torn
    * checkpoint must skip, not re-merge. Returns None exactly on a
    * covered replay (nothing read, nothing written, nothing
    * committed); the covered check re-runs on every lost-race retry, so
    * a replay racing its own first delivery cannot double-commit.
    *
    * WATERMARK CONTRACT (also binds [[append]]/[[streamingSink]]/
    * [[upsertSink]]): the watermark is ONE global monotone id per
    * table, with no writer identity — exactly-once holds for a SINGLE
    * logical writer whose batch ids never restart (Structured
    * Streaming's batch ids under one preserved checkpoint). Rebuilding
    * the checkpoint (ids restart at 0) or pointing a SECOND batch-id'd
    * query at the same table makes every id at-or-below the table's
    * watermark read as a replay — batches silently skip. Recovery
    * after a lost checkpoint: treat the table as the new stream's seed
    * (re-publish, or continue with append(batchId = None) until ids
    * pass the old watermark). Per-writer watermarks (Delta's
    * txnAppId/txnVersion) are the extension point if multi-writer
    * exactly-once is ever needed; the protocol slot is the manifest's
    * batch field becoming a map. */
  def rewriteBatch(spark: SparkSession, tableDir: String,
                   batchId: Option[Long], maxRetries: Int = 3)
                  (transform: DataFrame => DataFrame): Option[String] = {
    var attempts = 0
    var lastRace: String = ""
    while (attempts <= maxRetries) {
      val ms = manifestFiles(spark, tableDir)
      require(ms.nonEmpty,
        s"TableManifest: no manifest at $tableDir — not a manifested " +
          "table (publish() first)")
      val seq = manifestSeq(ms.last.getName)
      val snap = parseSnapshot(spark, ms.last)
      if (batchId.exists(b => snap.batch.exists(_ >= b)))
        return None // replay: the watermark already covers this batch
      attempts += 1
      val gen =
        try {
          val df = transform(spark.read.parquet(
            snap.generations.map(g => s"$tableDir/$g"): _*))
          Some(writeGeneration(spark, tableDir, seq + 1, df))
        } catch {
          case scala.util.control.NonFatal(e) =>
            lastRace = e.toString; None // stale base read — retry
        }
      gen.foreach { g =>
        if (commitSnapshot(spark, tableDir, seq + 1, Snapshot(Seq(g),
            (snap.batch.toSeq ++ batchId.toSeq).maxOption))) {
          vacuum(spark, tableDir, ms :+ manifestPath(tableDir, seq + 1),
            keepGens = snap.generations.toSet + g, dropFutureSeq = false)
          return Some(g)
        }
        // lost the CAS: the transform result is STALE (derived from a
        // superseded version) — never commit it later, re-derive
        fsOf(spark, tableDir).delete(new Path(s"$tableDir/$g"), true)
        lastRace = s"version ${seq + 1} taken by a concurrent commit"
      }
    }
    throw new java.io.IOException(
      s"TableManifest: rewrite at $tableDir did not commit in " +
        s"$attempts attempts (last: $lastRace) — writer storm?")
  }

  /** A `foreachBatch` CDC-upsert sink materializing the LATEST row per
    * key through the manifest — [[graft.streaming.Streams.upsertSnapshotSink]]'s
    * reader-safe, versioned successor: each micro-batch merges into the
    * current snapshot ([[Temporal.latestSnapshot]]'s total-order winner
    * per key, so late and duplicate deliveries resolve
    * deterministically) and commits as ONE new version — concurrent
    * readers resolve a whole snapshot, never a half-swapped tree, and
    * the superseded snapshot stays time-travel-readable. The batch id
    * rides the commit as the exactly-once watermark, so a torn-
    * checkpoint replay skips outright instead of leaning on merge
    * idempotence — under [[rewriteBatch]]'s single-writer watermark
    * contract (one preserved checkpoint; restarted or second-writer ids
    * silently skip). The table must be [[publish]]ed first (schema seed
    * — `updates.limit(0)` works). Cost note: an upsert rewrites the
    * snapshot per batch (the plain-parquet CDC cost, same as the swap
    * sink); at scale, key-bucket the snapshot and merge only touched
    * buckets — the commit contract is unchanged. */
  def upsertSink(tableDir: String, keyCols: Seq[String], tsCol: String,
                 tieCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      rewriteBatch(batch.sparkSession, tableDir, Some(batchId)) { cur =>
        Temporal.latestSnapshot(cur.unionByName(batch.toDF()),
          keyCols, tsCol, tieCol)
      }
      ()
    }

  /** A `foreachBatch` sink committing each micro-batch through the
    * manifest with its batch id as the exactly-once watermark: after a
    * crash between the sink's commit and the checkpoint's, Structured
    * Streaming re-offers the batch under the SAME id and [[append]]
    * skips it — end-to-end exactly-once on plain parquet, under the
    * single-writer watermark contract documented on [[rewriteBatch]]
    * (one preserved checkpoint; a rebuilt checkpoint's restarted ids
    * read as replays and silently skip). Usage:
    * `stream.writeStream.foreachBatch(TableManifest.streamingSink(dir))`.
    * The table must be [[publish]]ed first (its schema seed); an empty
    * seed `df.limit(0)` works. */
  def streamingSink(tableDir: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      append(batch.sparkSession, tableDir, batch, Some(batchId))
      ()
    }

  /** Reader-safe OPTIMIZE through the manifest — the pointer-table twin
    * of [[Layout.optimizeTable]]'s swap-managed verb, with the decision
    * priced the same way (metadata, never a data scan) but the
    * execution reader-isolated (one atomic commit; a concurrent reader
    * resolves the old generation set or the new one, never a mix, no
    * maintenance window).
    *
    * Decision: list the CURRENT generation set's data files (directory
    * metadata — an append-heavy ingest leaves one small file per
    * batch); the plan size is ceil(totalBytes / targetBytes) files. At
    * or below it → `("skip", None)`: no generation written, no version
    * committed, the optimize is idempotent. Above it → a [[rewrite]]
    * coalescing to the plan size — coalesce, not repartition: merging
    * needs no shuffle and preserves the generations' relative order, so
    * an ingest clustered by arrival stays clustered. A clustering
    * rewrite is the same one-liner through [[rewrite]] with a sort —
    * the verb stays a composition, not a second protocol. */
  def optimizeManifested(spark: SparkSession, tableDir: String,
                         targetBytes: Long,
                         maxRetries: Int = 3): (String, Option[String]) = {
    require(targetBytes > 0,
      s"optimizeManifested: targetBytes must be positive: $targetBytes")
    val fs = fsOf(spark, tableDir)
    // The WHOLE decide-then-execute cycle retries together: a resolved
    // generation can be vacuumed by two commits landing between the
    // resolve and the listing (the stalled-reader race read() retries
    // for), and a plan priced from a superseded listing must not be
    // committed against a newer head (rewrite would retry the DATA
    // against the new head but coalesce to the stale plan). Each
    // attempt re-resolves, re-prices, and commits with rewrite's own
    // retry disabled so a lost race comes back here.
    var attempts = 0
    var last: String = ""
    while (attempts <= maxRetries) {
      attempts += 1
      try {
        val gens = currentGenerations(spark, tableDir)
        require(gens.nonEmpty,
          s"TableManifest: no manifest at $tableDir — not a manifested " +
            "table (publish() first)")
        val files = gens.flatMap(g => dataFiles(fs, s"$tableDir/$g"))
        val planFiles = math.max(1L,
          (files.map(_.getLen).sum + targetBytes - 1) / targetBytes)
        return if (files.size <= planFiles) ("skip", None)
        else ("compact", Some(rewrite(spark, tableDir, maxRetries = 0)(
          _.coalesce(planFiles.toInt))))
      } catch {
        case e: IllegalArgumentException => throw e // not-a-table: loud
        case scala.util.control.NonFatal(e) => last = e.toString
      }
    }
    throw new java.io.IOException(
      s"TableManifest: optimizeManifested at $tableDir did not settle " +
        s"in $attempts attempts (last: $last) — writer storm?")
  }

  /** The data files of one directory: parquet parts only — committer
    * markers (`_SUCCESS`), hidden staging, and checksum siblings are
    * metadata, not content. Shared by the optimize pricing and its
    * specs so the notion of "data file" cannot drift between them. */
  private[graft] def dataFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(new Path(dir)).filter { e =>
      val n = e.getPath.getName
      e.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.toSeq

  /** Truncate the permanent manifest log to its newest `keepVersions`
    * entries — the retention knob for long-lived streaming tables,
    * where one small JSON per commit makes every log listing O(table
    * age). Returns the number of manifests dropped.
    *
    * MUST run with NO WRITER ACTIVE — [[recover]]'s contract, for the
    * same reason recovery has it: deleting a manifest frees its seq for
    * re-claim (the ABA the permanent log exists to prevent —
    * [[vacuum]]), and an in-flight append's claim window is
    * WALL-CLOCK-unbounded (it lists the head, then writes its data
    * generation for as long as the batch takes, then links); no
    * version-count window can bound a slow writer, so no keepVersions
    * value makes truncation safe under active writers. Concurrent
    * READERS stay safe with no coordination: the head manifests are
    * untouched, and the log walkers ([[versions]]/[[readVersion]])
    * treat a manifest deleted between their listing and their open as
    * the end of the retained window. The keepVersions floor is
    * defense-in-depth for accidental contract violations — a freed seq
    * at least `keepVersions` commits below the head is unreachable by
    * any writer whose listing is newer than the truncation's.
    *
    * Data below the cut leaves the time-travel window by definition, so
    * generations referenced ONLY by dropped manifests are vacuumed
    * first (without this they would leak forever once their manifests
    * are gone); generations shared with any KEPT version survive, so
    * the kept suffix stays fully readable. */
  def truncateLog(spark: SparkSession, tableDir: String,
                  keepVersions: Int = 100): Int = {
    require(keepVersions >= 8,
      s"TableManifest: keepVersions must be >= 8 (got $keepVersions) — " +
        "deleted seqs become claimable by stale writers (ABA), the " +
        "window is the defense-in-depth bound")
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    val ms = manifestFiles(spark, tableDir)
    if (ms.size <= keepVersions) return 0
    val (drop, keep) = ms.splitAt(ms.size - keepVersions)
    val keepGens =
      keep.flatMap(parseSnapshot(spark, _).generations).toSet
    drop.foreach { m =>
      // already gone = another truncation raced this one (a contract
      // violation the walk tolerates rather than crashes on)
      parseSnapshotIfPresent(spark, m).foreach { s =>
        s.generations
          .filterNot(keepGens.contains)
          .foreach(g => fs.delete(new Path(root, g), true))
        fs.delete(m, false)
      }
    }
    drop.size
  }

  /** Reconcile state after a crash: apply the retention rule (keep the
    * two newest manifests and the generations they reference) AND drop
    * future-seq orphans — generations and commit tmps a crashed commit
    * left behind with no manifest. MUST run with no writer active (an
    * in-flight commit's uncommitted generation is indistinguishable
    * from a crashed one); readers are unaffected (the newest manifest
    * never changes here). */
  def recover(spark: SparkSession, tableDir: String): Unit = {
    val ms = manifestFiles(spark, tableDir)
    require(ms.nonEmpty,
      s"TableManifest: no manifest at $tableDir — nothing to recover")
    vacuum(spark, tableDir, ms,
      keepGens =
        ms.takeRight(2).flatMap(parseSnapshot(spark, _).generations).toSet,
      dropFutureSeq = true)
  }

  /** Retention. Two rules, deliberately asymmetric:
    *
    *   - MANIFEST FILES ARE NEVER DELETED. Deleting an old manifest
    *     frees its seq for RE-CLAIM, and the commit CAS ("publish under
    *     this version's name, fail if it exists") silently degrades into
    *     ABA: a lagging writer whose view of the head is stale re-claims
    *     the freed seq, "wins", and its commit lands BEHIND the real
    *     head — a lost update (this file's concurrency spec caught
    *     exactly that: six concurrent appenders, six "committed", three
    *     batches gone). With the log immutable-and-permanent, a claim of
    *     seq s succeeds iff s = head+1 at the instant of the link, and
    *     the claimant merged head's (immutable) snapshot — commits are
    *     linearizable with no coordination. The cost is one small JSON
    *     per commit, which is precisely a transaction log (Delta keeps
    *     every commit's JSON the same way; log checkpointing/expiry is a
    *     retention knob this module doesn't need yet).
    *
    *   - DATA generations are vacuumed: any generation not referenced by
    *     the two newest manifests is deleted as soon as it is provably
    *     superseded (referenced by an AGED manifest — every committed
    *     generation is referenced by the manifest that created it). A
    *     generation referenced by NO manifest is either crash debris or
    *     a CONCURRENT writer's already-written, not-yet-committed data
    *     (indistinguishable without a writer registry), so only the
    *     explicit recover(), which requires no writer be active, may
    *     reap it.
    *
    * Older versions stay time-travel-readable for exactly as long as
    * their data survives — append-chain versions share generations with
    * the head, so appends keep a deep readable history; a rewrite
    * (compaction) cuts it to the previous version. [[versions]] reports
    * the readable window.
    *
    * `ms` is the ascending manifest listing INCLUDING the caller's
    * just-committed manifest, and `keepGens` the union of the two newest
    * versions' generation sets — the committing writer already holds
    * both in memory, so the winner's vacuum costs no extra listing or
    * re-parse of the log (which is permanent and grows with table age).
    *
    * Walk aged manifests newest-first and STOP at the first that needs
    * no vacuuming: on an append chain every aged manifest's generations
    * are still live in the head (O(1) per commit); after a rewrite the
    * one manifest holding the superseded chain is the newest aged one.
    * A manifest skipped by concurrent-vacuum interleaving can strand a
    * dead generation behind a clean one — a bounded disk leak, not a
    * correctness issue; recover()'s exhaustive unreferenced sweep
    * reclaims it. */
  private def vacuum(spark: SparkSession, tableDir: String, ms: Seq[Path],
                     keepGens: Set[String], dropFutureSeq: Boolean): Unit = {
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    ms.dropRight(2).reverseIterator
      .map { m =>
        parseSnapshot(spark, m).generations
          .filterNot(keepGens.contains)
          .count(g => fs.delete(new Path(root, g), true))
      }
      .takeWhile(_ > 0).foreach(_ => ())
    if (dropFutureSeq) fs.listStatus(root).foreach { e =>
      val n = e.getPath.getName
      if (e.isDirectory && n.startsWith(GenPrefix) && !keepGens.contains(n))
        fs.delete(e.getPath, true)
      else if (e.isFile &&
          n.startsWith("._manifest-") && n.endsWith(".tmp"))
        fs.delete(e.getPath, false)
    }
  }
}
