package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch diagnostic main (NOT part of the library surface; deleted
  * before the round closes): runs one registered query with a job
  * listener that prints per-job wall time + description, so the
  * per-action breakdown of multi-action verbs is visible without a UI. */
object Diag {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("q253_row_deletes")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", shufflePartitions = 32,
        appName = "diag")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var epoch = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
        val now = System.nanoTime()
        val ms = (now - t0) / 1e6
        val off0 = (t0 - epoch) / 1e6
        val d = desc.replaceAll("\\s+", " ").take(90)
        println(f"JOB ${je.jobId}%4d start+${off0}%8.0f dur ${ms}%7.1f ms  $d")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        println(f"  STAGE ${i.stageId}%4d ${i.numTasks}%3d tasks  ${i.name.take(100)}")
      }
    })
    val form = SparkEntry.benchForm.getOrElse(target, SparkEntry.queries(target))
    (1 to 2).foreach { i =>
      println(s"===== RUN $i $target")
      epoch = System.nanoTime()
      val t0 = System.nanoTime()
      form(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
