package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Measurement tooling (optimization rounds): run one gate query under a
  * SparkListener and print a per-job / per-stage wall+metric breakdown, so
  * the expensive segment of a multi-job chain (streaming gates, store
  * writers) is identified by measurement instead of guesswork.
  *
  * Usage: runMain graft.ProfileQ <sfDir> <queryName> [reps]
  * Warm pass first (untimed), then `reps` (default 1) profiled passes.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQ <sfDir> <query> [reps]")
    val sfDir = args(0)
    val qname = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // measurement-only conf overrides (semicolon-separated k=v), so §9
    // session-config candidates can be A/B'd per gate WITHOUT touching the
    // bench harness: SPARK_GRAFT_EXTRA_CONF="spark.sql.join.preferSortMergeJoin=false"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      if (kv.contains("=")) {
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, var desc: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var taskTimeMs: Long = 0L, var shuffleReadB: Long = 0L,
        var shuffleWriteB: Long = 0L, var inputB: Long = 0L)
    val jobs = new scala.collection.concurrent.TrieMap[Int, JobRec]()
    val stageToJob = new scala.collection.concurrent.TrieMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, desc, e.time))
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1
          j.tasks += si.numTasks
          val m = si.taskMetrics
          if (m != null) {
            j.taskTimeMs += m.executorRunTime
            j.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
            j.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
            j.inputB += m.inputMetrics.bytesRead
          }
        }
      }
    }

    val fn = SparkEntry.queries(qname)
    def resetStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // warm
    try fn(spark, sfDir).count() catch { case e: Throwable =>
      System.err.println(s"warm failed: $e") }
    resetStorage()

    (1 to reps).foreach { r =>
      jobs.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // the listener bus is asynchronous: drain briefly so the last job's
      // onJobEnd/onStageCompleted land before the listener detaches
      // (otherwise the final rows print end=0 / negative jobWall)
      val drainDeadline = System.nanoTime() + 2L * 1000 * 1000 * 1000
      while (jobs.values.exists(_.end == 0L) && System.nanoTime() < drainDeadline)
        Thread.sleep(50)
      spark.sparkContext.removeSparkListener(listener)
      resetStorage()
      println(f"%n=== $qname rep $r wall $wall%.3f s, ${jobs.size} jobs ===")
      println(f"${"jobWall"}%8s ${"gap"}%7s ${"stg"}%4s ${"tasks"}%6s " +
        f"${"taskTime"}%9s ${"shufR"}%8s ${"shufW"}%8s ${"input"}%9s  desc")
      var prevEnd = 0L
      jobs.values.toSeq.sortBy(_.start).foreach { j =>
        // a job whose end event never arrived (bus drain timed out) must
        // not print a negative wall — label it instead
        val w = if (j.end == 0L) Double.NaN else (j.end - j.start) / 1e3
        val gap = if (prevEnd == 0 || j.end == 0L) 0.0 else (j.start - prevEnd) / 1e3
        if (j.end != 0L) prevEnd = j.end
        def mb(b: Long) = f"${b / 1e6}%.1fM"
        println(f"$w%8.3f $gap%7.3f ${j.stages}%4d ${j.tasks}%6d " +
          f"${j.taskTimeMs / 1e3}%9.3f ${mb(j.shuffleReadB)}%8s " +
          f"${mb(j.shuffleWriteB)}%8s ${mb(j.inputB)}%9s  ${j.desc.take(70)}")
      }
      val jobSum = jobs.values.filter(_.end != 0L)
        .map(j => (j.end - j.start) / 1e3).sum
      println(f"job wall sum $jobSum%.3f s (driver gaps = ${wall - jobSum}%.3f s)")
    }
    spark.stop()
  }
}
