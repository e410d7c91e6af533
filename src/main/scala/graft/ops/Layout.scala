package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet keeps min/max statistics per file and row group, and readers
  * skip units whose range cannot match the filter. Those statistics only
  * help when the writer CLUSTERED the data — a round-robin layout gives
  * every file the full key range and nothing ever prunes. Sorting solves
  * one dimension; Z-ordering (bit-interleaving) keeps BOTH dimensions'
  * ranges narrow per file, so filters on either column (or both) prune.
  *
  * The interleave is a pure fold of codegen'd bitwise column ops — no UDF,
  * no custom expression needed.
  */
object Layout {

  /** Z-order (Morton) key of two non-negative integer columns: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1.
    *
    * `aBits`/`bBits` declare each column's domain width; narrower domains
    * are left-shifted so both columns' MOST significant bits interleave.
    * Without this alignment a wider domain (say an 11-bit minute against
    * an 8-bit user id) monopolizes the curve's high bits and the narrow
    * column never clusters — the curve degenerates to a plain sort on the
    * wide column. Skewed domains should be rank-bucketed to a uniform
    * range first; values are masked to their declared width. */
  def zorderKey2(a: Column, b: Column, bits: Int = 21,
                 aBits: Int = -1, bBits: Int = -1): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (aw, bw) = (if (aBits <= 0) bits else aBits,
      if (bBits <= 0) bits else bBits)
    require(aw <= bits && bw <= bits, s"column widths exceed bits=$bits")
    val al = shiftleft(a.cast("long")
      .bitwiseAND(lit((1L << aw) - 1)), bits - aw)
    val bl = shiftleft(b.cast("long")
      .bitwiseAND(lit((1L << bw) - 1)), bits - bw)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` as parquet clustered along the Z-curve of (keyA, keyB):
    * range-partition on the interleaved key (so files tile the curve),
    * sort within each partition (so row groups tile it too), drop the
    * helper column. `files` bounds output file count — size it to the
    * target file size (~128 MB–1 GB at scale), not the partition count of
    * the incoming frame. */
  def writeZOrdered(df: DataFrame, path: String, keyA: Column, keyB: Column,
                    files: Int, bits: Int = 21,
                    aBits: Int = -1, bBits: Int = -1): Unit =
    df.withColumn("_zkey", zorderKey2(keyA, keyB, bits, aBits, bBits))
      .repartitionByRange(files, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory to ~`targetBytes` files — the antidote to
    * the small-file problem every streaming sink and over-parallel write
    * creates (at 100 TB, file-count scales driver planning and NameNode/
    * object-store metadata, not just read throughput). Sizes come from the
    * filesystem, the rewrite lands next to the source and swaps in via
    * rename, and the file count is computed from actual bytes, never the
    * incoming partition count. Returns the new file count. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    // the target is swap-managed (compact itself swaps): honor
    // recoverSwap's contract and repair a crashed prior swap BEFORE
    // listing/reading — otherwise the data sits at `._pre` and compact
    // fails on the missing path instead of repairing it
    recoverSwap(spark, path)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = fs.listStatus(p)
    // partition-aware compaction (per-directory rewrite preserving the
    // hive layout) is a different operator; refuse rather than silently
    // flattening date=.../part-*.parquet into one unpartitioned file
    require(!entries.exists(_.isDirectory),
      s"compact: $path contains subdirectories (partitioned layout?) — " +
        "compact operates on a flat parquet directory")
    val bytes = entries.filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    require(bytes > 0, s"compact: no parquet data found under $path")
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new Path(p.getParent, p.getName + "._compacting")
    spark.read.parquet(path)
      .repartition(files)
      .write.mode("overwrite").parquet(tmp.toString)
    swapInto(spark, tmp.toString, path)
    files
  }

  /** Partition-aware compaction EXECUTOR — applies [[compactionPlan]]'s
    * merge rule to a hive-partitioned parquet directory and closes the
    * planner→executor loop the way W1–W6 close the reference's workflow
    * loop (write, then verify — here content identity via the
    * [[Audit.partitionChecksums]] manifest, see q233). Per partition
    * directory: list files in stable name order, group consecutive
    * files by the planner's offset rule (group = (cum − size) div
    * target, on ACTUAL bytes), rewrite each group as exactly one file,
    * and swap the new layout in crash-safely ([[swapInto]] — a failure
    * anywhere leaves the original table intact).
    *
    * Scale shape: the driver loop walks METADATA (partitions × groups —
    * the same rows the planner emits); each group's data work is a
    * distributed read + single-task write bounded by `targetBytes` (the
    * planner's `max_group_size` bound, so coalesce(1) is safe by
    * construction). A warehouse deployment submits group jobs
    * concurrently (they are independent); the rewrite rule, file
    * naming, and swap contract are unchanged. Returns the
    * (partition dir, files before, files after) summary. */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetBytes: Long): DataFrame = {
    require(targetBytes > 0,
      s"compactPartitioned: target must be positive: $targetBytes")
    recoverSwap(spark, path)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val partDirs = fs.listStatus(p).filter(_.isDirectory)
      .sortBy(_.getPath.getName)
    require(partDirs.nonEmpty,
      s"compactPartitioned: no partition directories under $path — " +
        "use compact() for a flat layout")
    val tmp = new Path(p.getParent, p.getName + "._compacting")
    fs.delete(tmp, true)
    val summary = partDirs.map { d =>
      val entries = fs.listStatus(d.getPath)
      // the rewrite copies only direct *.parquet files, and the final
      // swap replaces the WHOLE table — any partition content the loop
      // didn't copy (a nested partition level, non-parquet data files)
      // would be silently destroyed. Refuse loudly instead.
      require(!entries.exists(_.isDirectory),
        s"compactPartitioned: ${d.getPath} contains subdirectories " +
          "(multi-level partitioning?) — only single-level hive layouts " +
          "are supported")
      val files = entries
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
      require(files.nonEmpty,
        s"compactPartitioned: no parquet files under ${d.getPath} — " +
          "refusing a rewrite that would drop the partition")
      var cum = 0L
      val groups = files.map { f =>
        cum += f.getLen
        ((cum - f.getLen) / targetBytes, f.getPath)
      }.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
      val partName = d.getPath.getName
      groups.zipWithIndex.foreach { case (paths, i) =>
        val gDir = new Path(tmp, s"$partName/_group_$i")
        spark.read.parquet(paths.map(_.toString): _*)
          .coalesce(1)
          .write.mode("overwrite").parquet(gDir.toString)
        val written = fs.listStatus(gDir)
          .filter(_.getPath.getName.endsWith(".parquet"))
        require(written.length == 1,
          s"group rewrite must land one file, got ${written.length}")
        val dst = new Path(tmp, f"$partName/part-$i%05d.parquet")
        if (!fs.rename(written.head.getPath, dst))
          throw new java.io.IOException(
            s"compactPartitioned: rename ${written.head.getPath} -> $dst failed")
        fs.delete(gDir, true)
      }
      (partName, files.length.toLong, groups.length.toLong)
    }.toSeq
    swapInto(spark, tmp.toString, path)
    import spark.implicits._
    summary.toDF("part_dir", "files_before", "files_after")
  }

  /** Repair the aftermath of a [[swapInto]] that crashed mid-swap. MUST
    * run before READING a swap-managed directory (not just before the next
    * swap): a crash between the two renames leaves the target missing and
    * `._pre` holding the only copy — a reader that treats the missing
    * directory as "empty/first run" would rebuild from nothing and the
    * next swap would then discard the `._pre` history. */
  def recoverSwap(spark: SparkSession, target: String): Unit = {
    val p = new Path(target)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val old = new Path(p.getParent, p.getName + "._pre")
    if (fs.exists(old)) {
      if (fs.exists(p)) {
        // crashed after the swap-in but before cleanup: the target is the
        // newer data, ._pre is the superseded copy
        fs.delete(old, true)
      } else {
        // crashed BETWEEN the renames: ._pre holds the only copy —
        // restore it (deleting it would destroy exactly the data the
        // two-rename design protects)
        if (!fs.rename(old, p)) throw new java.io.IOException(
          s"recoverSwap: rename $old -> $p failed")
      }
    }
  }

  /** Compaction PLANNER over a partitioned file inventory — the decision
    * layer [[compact]] executes one directory of: given (partition,
    * file, size) metadata rows, group CONSECUTIVE files (stable file-id
    * order, so a later executor rewrite streams each group without
    * re-shuffling) into ~`target`-size merge groups via the offset rule
    * group = (cum − size) div target (q225's integer recipe), and emit
    * the per-partition plan summary a table-maintenance scheduler ranks:
    * file count, total size, group count, small-file count (< target/4,
    * the metadata-pressure signal), and the largest planned group (the
    * rewrite's memory bound). All-integer; the per-partition window
    * rides the file inventory — metadata-sized, bounded by files per
    * partition, never data-sized. */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
                     sizeCol: String, target: Long): DataFrame = {
    require(target > 0, s"compactionPlan: target must be positive: $target")
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum", sum(col(sizeCol)).over(w))
      .withColumn("grp",
        expr(s"(cum - `$sizeCol`) div ${target}L"))
      .groupBy(col(partCol), col("grp"))
      .agg(count(lit(1)).as("gf"), sum(col(sizeCol)).as("gs"),
        sum(when(col(sizeCol) * 4 < lit(target), lit(1L))
          .otherwise(lit(0L))).as("gsmall"))
      .groupBy(col(partCol))
      .agg(sum(col("gf")).as("n_files"),
        sum(col("gs")).as("total_size"),
        count(lit(1)).as("n_groups"),
        sum(col("gsmall")).as("small_files"),
        max(col("gs")).as("max_group_size"))
      .orderBy(partCol)
  }

  /** Clustering-depth audit — the metric Delta/Iceberg OPTIMIZE ranks
    * partitions by: for each file's [lo, hi] statistics range on a probe
    * column, the OVERLAP DEPTH at a point is how many files a point
    * lookup there must read (perfectly clustered files ⇒ depth 1;
    * round-robin layout ⇒ depth = file count). Depth is evaluated at
    * every file's `lo` (where it is locally maximal for closed
    * intervals), via a bounded within-partition inequality self-join —
    * files-per-partition is a layout constant (dozens), so the join is
    * metadata² per partition, never data-sized. Emits per partition:
    * file count, max depth, mean depth (round 6) — feed the worst
    * partitions to [[writeZOrdered]]/[[compact]]. */
  def clusteringDepth(files: DataFrame, partCol: String, fileCol: String,
                      loCol: String, hiCol: String): DataFrame = {
    val a = files.select(col(partCol), col(fileCol).as("f"),
      col(loCol).as("lo"), col(hiCol).as("hi"))
    val b = a.select(col(partCol), col("lo").as("g_lo"),
      col("hi").as("g_hi"))
    a.join(b, Seq(partCol))
      .filter(col("g_lo") <= col("lo") && col("lo") <= col("g_hi"))
      .groupBy(col(partCol), col("f"))
      .agg(count(lit(1)).as("depth"))
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_files"),
        max(col("depth")).as("max_depth"),
        round(avg(col("depth")), 6).as("avg_depth"))
      .orderBy(partCol)
  }

  /** Crash-safe directory swap: two renames, no delete-before-swap. The
    * target stays recoverable at `._pre` until the replacement is in
    * place; a crash between the renames leaves the data findable (and the
    * second rename re-runnable) instead of a window where NO copy exists
    * at any expected location. Rolls the target back if the swap-in
    * fails. */
  def swapInto(spark: SparkSession, tmpDir: String, target: String): Unit = {
    val p = new Path(target)
    val tmp = new Path(tmpDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val old = new Path(p.getParent, p.getName + "._pre")
    recoverSwap(spark, target)
    val hadTarget = fs.exists(p)
    if (hadTarget && !fs.rename(p, old))
      throw new java.io.IOException(s"swapInto: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      if (hadTarget) fs.rename(old, p) // roll back; target untouched
      throw new java.io.IOException(s"swapInto: rename $tmp -> $p failed")
    }
    fs.delete(old, true)
  }
}
