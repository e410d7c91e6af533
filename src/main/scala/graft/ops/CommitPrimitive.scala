package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic fail-if-exists publication primitive behind every
  * [[TableManifest]] commit — extracted to a seam so supporting a new
  * store is a CONTRACT (implement + pass [[CommitCertification]])
  * rather than a code edit inside the commit path.
  *
  * Contract ([[CommitCertification]] is its executable form):
  *   1. `publish(tmp, dst)` returns true iff THIS call created `dst`;
  *      among any number of concurrent publishers of the same `dst`,
  *      EXACTLY ONE returns true (the commit CAS).
  *   2. When it returns true, `dst` is immediately readable with the
  *      complete content of the winner's `tmp` — the destination must
  *      never be observable half-written (publication is of a
  *      fully-staged file, never a streaming write to `dst`).
  *   3. When it returns false, `dst` and its content are untouched.
  *   4. `tmp` is left in place either way (the caller owns staging
  *      cleanup — the winner's `dst` may be a hard link to it).
  *
  * What is NOT acceptable: any check-then-act emulation (exists? then
  * rename-with-replace) — POSIX rename(2) silently REPLACES an existing
  * destination, so two racing writers both "win" one version and the
  * first commit's batches vanish. [[TableManifest]]'s own concurrency
  * spec caught exactly that on a plain-rename draft, and
  * [[CommitCertification]] detects it in ~one run of the race leg
  * (proven by the deliberately-broken impl in CommitPrimitiveSpec).
  */
trait CommitPrimitive {
  def name: String
  def publish(fs: FileSystem, conf: Configuration,
              tmp: Path, dst: Path): Boolean
}

object CommitPrimitive {

  /** Local filesystems: a HARD LINK of the fully-written tmp onto the
    * destination name — link(2) fails with EEXIST atomically in the
    * kernel, and the destination appears with its complete content in
    * the same syscall. */
  object HardLink extends CommitPrimitive {
    val name = "hard-link"
    def publish(fs: FileSystem, conf: Configuration,
                tmp: Path, dst: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  /** HDFS-semantics filesystems: `FileContext.rename` WITHOUT the
    * OVERWRITE option — atomic with the existence check on HDFS (one
    * NameNode op), the same primitive Spark's HDFSMetadataLog trusts
    * for its streaming commit log. The atomicity leg of its
    * certification is the NameNode's semantics, NOT reproducible on a
    * local filesystem (FileContext over file:// degrades to
    * check-then-rename — the TOCTOU [[CommitCertification]] exists to
    * catch — which is why [[forScheme]] never offers this impl for
    * local paths); the sequential legs run anywhere. */
  object HdfsRename extends CommitPrimitive {
    val name = "hdfs-no-overwrite-rename"
    def publish(fs: FileSystem, conf: Configuration,
                tmp: Path, dst: Path): Boolean =
      try {
        org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
          .rename(tmp, dst) // default = no overwrite
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if e.getMessage != null &&
              e.getMessage.contains("already exists") => false
      }
  }

  /** The certified primitive for a filesystem scheme, or None — in
    * which case the commit path refuses loudly ([[TableManifest]]'s
    * object-store refusal: stores that emulate rename as
    * copy+delete behind a client-side existence check give two racing
    * writers the same seq). A store with a true conditional-put
    * (S3 If-None-Match, GCS if-generation-match=0) earns its entry by
    * implementing the trait and passing [[CommitCertification]] against
    * the real store. */
  def forScheme(scheme: String): Option[CommitPrimitive] =
    if (scheme == null || scheme == "file") Some(HardLink)
    else if (scheme == "hdfs" || scheme == "viewfs") Some(HdfsRename)
    else None
}

/** Executable certification of the [[CommitPrimitive]] contract — any
  * new store impl must return NO findings from [[certify]] (run against
  * the real store) before [[CommitPrimitive.forScheme]] may offer it.
  * The race leg is the one that kills check-then-act emulations: all
  * contenders stage distinct complete bodies, fire through a latch, and
  * exactly one may win — with the destination holding exactly the
  * winner's complete body, immediately. */
object CommitCertification {

  /** Run the full certification under `scratchDir` (created, must be on
    * the store under test). Returns violation findings; empty = pass.
    * `races` rounds of `contenders`-way publication races, plus the
    * sequential semantics legs. */
  def certify(primitive: CommitPrimitive, fs: FileSystem,
              conf: Configuration, scratchDir: String,
              contenders: Int = 8, races: Int = 20): Seq[String] = {
    val findings = scala.collection.mutable.ArrayBuffer.empty[String]
    val root = new Path(scratchDir)
    fs.mkdirs(root)

    def stage(name: String, body: String): Path = {
      val p = new Path(root, name)
      val out = fs.create(p, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      p
    }
    def readAll(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }

    // Leg 1: sequential CAS semantics — second publish of the same dst
    // returns false and leaves the first content untouched.
    {
      val dst = new Path(root, "seq-dst")
      val a = stage("seq-a.tmp", "content-A")
      val b = stage("seq-b.tmp", "content-B")
      if (!primitive.publish(fs, conf, a, dst))
        findings += "sequential: first publish did not win"
      if (readAll(dst) != "content-A")
        findings += s"sequential: winner content wrong: ${readAll(dst)}"
      if (primitive.publish(fs, conf, b, dst))
        findings += "sequential: second publish of an existing dst won"
      if (readAll(dst) != "content-A")
        findings += "sequential: losing publish mutated the destination"
    }

    // Leg 2: the publication race — `contenders` threads, distinct
    // complete bodies, one latch. Exactly one winner per round; the
    // destination holds exactly the winner's complete body the moment
    // its publish returns.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(contenders)
    try {
      for (round <- 0 until races) {
        val dst = new Path(root, f"race-$round%03d")
        val tmps = (0 until contenders).map(w =>
          stage(f"race-$round%03d-w$w.tmp", s"round-$round-writer-$w"))
        val start = new java.util.concurrent.CountDownLatch(1)
        val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val fs2 = dst.getFileSystem(conf)
        val futures = (0 until contenders).map { w =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              start.await()
              try if (primitive.publish(fs2, conf, tmps(w), dst)) {
                // contract 2: winner's content visible immediately
                val seen = readAll(dst)
                if (seen != s"round-$round-writer-$w")
                  errs.add(s"round $round: winner $w read back '$seen'")
                wins.add(w)
              } catch {
                case t: Throwable => errs.add(s"round $round w$w: $t")
              }
            }
          })
        }
        start.countDown()
        futures.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
        if (wins.size != 1)
          findings += s"race round $round: ${wins.size} winners " +
            s"(${wins.toArray.mkString(",")}) — the CAS admitted " +
            (if (wins.size == 0) "nobody" else "a lost update")
        if (!errs.isEmpty)
          findings ++= errs.toArray.map(_.toString)
        else if (wins.size == 1 &&
            readAll(dst) != s"round-$round-writer-${wins.peek()}")
          findings += s"race round $round: final content is not the " +
            s"winner's (${readAll(dst)})"
      }
    } finally pool.shutdownNow()
    findings.toSeq
  }
}
