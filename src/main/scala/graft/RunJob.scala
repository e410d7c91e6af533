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
  *     [--continuous --interval-ms MS --iterations N] [--work-dir DIR]
  */
object RunJob {

  private[graft] def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  private def jsonLine(r: Jobs.JobResult): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val variance = r.variancePct.map(v => s""","variance_pct":$v""").getOrElse("")
    val error = r.error.map(e => s""","error":${q(e)}""").getOrElse("")
    s"""{"job_id":${q(r.jobId)},"name":${q(r.name)},"status":${q(r.status)},""" +
      s""""rows_processed":${r.rowsProcessed},""" +
      s""""duration_seconds":${r.durationSeconds}$variance$error}"""
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val cfg = Jobs.JobConfig(
      id = a.getOrElse("job-id", "1"),
      jobType = a.getOrElse("job-type", ""),
      name = a.getOrElse("name", a.getOrElse("job-type", "job")),
      loadDate = a.getOrElse("load-date",
        java.time.LocalDate.now().toString),
      limit = a.get("limit").map(_.toInt),
      sfDir = a.getOrElse("sf-dir", ""))
    val workDir = a.getOrElse("work-dir", "/root/repo/target/graft-jobs")
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
