package graft

import graft.workflow.Jobs

/** CLI job runner — the engine-side analogue of the reference's entry point
  * (/root/reference/app.py:35-100 argparse, :244-366 main): parse flags,
  * build a session, dispatch through the typed registry, print a JSON
  * result line, exit non-zero on failure (continuous mode: non-zero unless
  * ≥50% of iterations succeeded, matching app.py:340-341).
  *
  *   runMain graft.RunJob --job-type poc_etl --sf-dir /root/testdata/sf0.001 \
  *     [--job-id ID] [--name NAME] [--load-date YYYY-MM-DD] [--limit N] \
  *     [--job-config JSON | --job-config-file PATH] \
  *     [--continuous --interval-ms MS --iterations N] [--work-dir DIR]
  *
  * `--job-config` takes inline JSON and `--job-config-file` a JSON file,
  * with the reference's field names (`type`, `id`, `name`, `load_date`,
  * `limit`, plus `sf_dir` for the data location) — app.py:294-322.
  * Config-file/inline values win over individual flags, matching the
  * reference's precedence.
  */
object RunJob {

  private[graft] def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  /** Parse a job-config JSON object (inline text or file contents) into a
    * flat string map; scalar values are stringified, anything non-object
    * is rejected (reference json.loads + required-field gate,
    * app.py:296-301,325-330). */
  private[graft] def parseJobConfig(json: String): Map[String, String] = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(json) match {
      case JObject(fields) => fields.map {
        case (k, JString(v)) => k -> v
        case (k, JInt(v)) => k -> v.toString
        case (k, JLong(v)) => k -> v.toString
        case (k, JDouble(v)) => k -> v.toString
        case (k, JBool(v)) => k -> v.toString
        case (k, other) =>
          // silently dropping a malformed field would let a flag/default
          // win against the documented config-over-flags precedence
          throw new IllegalArgumentException(
            s"job config field '$k' must be a scalar, got $other")
      }.toMap
      case _ =>
        throw new IllegalArgumentException("job config must be a JSON object")
    }
  }

  private[graft] def loadJobConfig(a: Map[String, String]): Map[String, String] =
    a.get("job-config").map(parseJobConfig)
      .orElse(a.get("job-config-file").map { p =>
        parseJobConfig(new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
          java.nio.charset.StandardCharsets.UTF_8))
      })
      .getOrElse(Map.empty)

  private def jsonLine(r: Jobs.JobResult): String = {
    def q(s: String) = JsonEscape.str(s)
    val variance = r.variancePct.map(v => s""","variance_pct":$v""").getOrElse("")
    val error = r.error.map(e => s""","error":${q(e)}""").getOrElse("")
    s"""{"job_id":${q(r.jobId)},"name":${q(r.name)},"status":${q(r.status)},""" +
      s""""rows_processed":${r.rowsProcessed},""" +
      s""""duration_seconds":${r.durationSeconds}$variance$error}"""
  }

  /** Merge flag + config-file views into the typed config; config values
    * win (reference precedence, app.py:294-322). */
  private[graft] def buildConfig(a: Map[String, String]): Jobs.JobConfig = {
    val jc = loadJobConfig(a)
    Jobs.JobConfig(
      id = jc.getOrElse("id", a.getOrElse("job-id", "1")),
      jobType = jc.getOrElse("type", a.getOrElse("job-type", "")),
      name = jc.getOrElse("name", a.getOrElse("name",
        jc.getOrElse("type", a.getOrElse("job-type", "job")))),
      loadDate = jc.getOrElse("load_date", a.getOrElse("load-date",
        java.time.LocalDate.now().toString)),
      limit = jc.get("limit").orElse(a.get("limit")).map(_.toInt),
      sfDir = jc.getOrElse("sf_dir", a.getOrElse("sf-dir", "")))
  }

  def main(args: Array[String]): Unit = {
    // pair-parse FIRST so --work-dir is honored uniformly (an advisory
    // review caught the list branch hardcoding the registry work dir
    // and silently ignoring a --work-dir on the same invocation)
    val a = parseArgs(args.filterNot(_ == "--list-job-types"))
    val workDir = a.getOrElse("work-dir", "/root/repo/target/graft-jobs")
    // discoverability verb (reference app.py:74-76,289-291): list the
    // registry and exit 0 — a boolean flag, short-circuits buildConfig
    if (args.contains("--list-job-types")) {
      val registry = Jobs.builtinRegistry(workDir)
      val types = registry.values.toSeq.sortBy(_.jobType)
        .map(s => s"${JsonEscape.str(s.jobType)}:" +
          JsonEscape.str(s.description))
        .mkString("{", ",", "}")
      println(s"""{"job_types":$types}""")
      return
    }
    val cfg = buildConfig(a)
    val spark = GraftSession.builder(
        a.getOrElse("master", "local[*]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val registry = Jobs.builtinRegistry(workDir)
    val exitCode =
      if (a.get("continuous").exists(_.toBoolean)) {
        val stats = Jobs.runContinuous(spark, registry, cfg,
          intervalMillis = a.getOrElse("interval-ms", "60000").toLong,
          maxIterations = a.getOrElse("iterations", "1").toInt)
        println(s"""{"iterations":${stats.iterations},""" +
          s""""successes":${stats.successes},"failures":${stats.failures},""" +
          s""""total_rows":${stats.totalRows},""" +
          s""""success_rate":${stats.successRate}}""")
        if (stats.successRate >= 0.5) 0 else 1
      } else {
        val r = Jobs.execute(spark, registry, cfg)
        println(jsonLine(r))
        if (r.status == "success") 0 else 1
      }
    spark.stop()
    sys.exit(exitCode)
  }
}
