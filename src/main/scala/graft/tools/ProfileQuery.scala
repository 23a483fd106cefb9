package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job attribution for one declared query — the §1 "measure first"
  * companion to Bench's single wall number. Runs the query REPS times
  * (first run = warm-up discipline is the caller's problem; run it on a
  * warmed JVM or pass reps>=3 and read the later runs) and prints, per
  * run: planning time (fn + executedPlan force), drain time, then a
  * per-job table (duration, #tasks, shuffle bytes) so the expensive jobs
  * inside a multi-action query (cache builds, localCheckpoints,
  * broadcast collects, the final drain) are separately visible.
  *
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <name> [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.SparkEntry.allDefs.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))

    case class JobRec(id: Int, var desc: String, var start: Long,
      var end: Long, var tasks: Int, var shuffleRW: Long) {
      def durMs: Long = if (end > 0) end - start else -1
    }
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRec(e.jobId, desc.take(90), e.time, 0, 0, 0)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        for {
          jid <- stageToJob.get(e.stageInfo.stageId)
          j <- jobs.get(jid)
          m <- Option(e.stageInfo.taskMetrics)
        } {
          j.tasks += e.stageInfo.numTasks
          j.shuffleRW += m.shuffleWriteMetrics.bytesWritten +
            m.shuffleReadMetrics.localBytesRead +
            m.shuffleReadMetrics.remoteBytesRead
        }
      }
    })

    // warmup like the bench does, so rep 1 is JIT-warm. ADVICE r15:
    // the dir comes from the env (default = the bench's warm dir), and
    // a failed warm-up is REPORTED instead of silently leaving rep 1
    // cold while the tool's contract says JIT-warm.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    try {
      d.fn(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
    } catch {
      case e: Throwable =>
        System.err.println(s"[profile] WARNING: warm-up at $warmDir " +
          s"FAILED (${e.getMessage}) — rep 1 runs COLD; set " +
          "SPARK_GRAFT_WARM_DIR to a reachable fixture dir")
    }
    spark.catalog.clearCache(); System.gc()

    for (r <- 1 to reps) {
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      val df = d.fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan // force planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[rep $r] build+plan ${(t1 - t0) / 1e9}%.2fs  " +
        f"drain ${(t2 - t1) / 1e9}%.2fs  total ${(t2 - t0) / 1e9}%.2fs")
      Thread.sleep(300) // let listener events drain
      jobs.synchronized {
        jobs.values.toSeq.sortBy(-_.durMs).take(20).foreach { j =>
          println(f"    job ${j.id}%4d ${j.durMs}%6dms tasks=${j.tasks}%4d " +
            f"shufMB=${j.shuffleRW / 1048576}%4d  ${j.desc}")
        }
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
