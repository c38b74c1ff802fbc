package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev utility (r19 optimization round): per-JOB wall-clock attribution for
  * any named SparkEntry query. A query's bench seconds are the sum of every
  * Spark job its construction + one action launch (guard counts, bounded
  * collects, checkpoint materializations, the final toRdd count) plus pure
  * driver time (planning, literal-frame noise draws) — this tool makes that
  * split visible so optimization targets the right layer.
  *
  * Usage: sbt "runMain graft.tools.ProfileQuery <query> [query...]"
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as the bench). Not part of the
  * driver contract.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/parquet/shuffle paths (the bench's own warmup)
    try spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
      var stages: Int = 0, var tasks: Int = 0, desc: String)
    val jobs = new scala.collection.mutable.ArrayBuffer[JobRec]
    // load-robust per-rep totals: shuffle RECORD counts are deterministic
    // for a deterministic plan (the A/B metric wall-clock can't be on a
    // shared machine), executor CPU time is load-robust-ish
    final case class Totals(var cpuNs: Long = 0L, var runMs: Long = 0L,
      var shufR: Long = 0L, var shufW: Long = 0L, var inRec: Long = 0L,
      var sortSpill: Long = 0L)
    val tot = Totals()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += JobRec(e.jobId, e.time,
            desc = Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          jobs.lastOption.foreach { j =>
            j.stages += 1
            j.tasks += e.stageInfo.numTasks
          }
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            tot.cpuNs += m.executorCpuTime
            tot.runMs += m.executorRunTime
            tot.shufR += m.shuffleReadMetrics.recordsRead
            tot.shufW += m.shuffleWriteMetrics.recordsWritten
            tot.inRec += m.inputMetrics.recordsRead
            tot.sortSpill += m.memoryBytesSpilled
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // rep 0 warms, reps 1-2 measure (the bench's median-of-3 shape)
      (0 to 2).foreach { rep =>
        jobs.synchronized(jobs.clear())
        jobs.synchronized { tot.cpuNs = 0; tot.runMs = 0; tot.shufR = 0
          tot.shufW = 0; tot.inRec = 0; tot.sortSpill = 0 }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain job-end events
        val js = jobs.synchronized(jobs.toList)
        val jobSum = js.filter(_.end > 0).map(j => (j.end - j.start) / 1e3).sum
        println(f"===== $name rep$rep wall $wall%.2fs, ${js.size} jobs " +
          f"summing $jobSum%.2fs (gap = driver/planning " +
          f"${wall - jobSum}%.2fs) =====")
        println(f"      cpu ${tot.cpuNs / 1e9}%.2fs run ${tot.runMs / 1e3}%.2fs " +
          f"shufR ${tot.shufR} shufW ${tot.shufW} input ${tot.inRec} " +
          f"spill ${tot.sortSpill}")
        if (rep == 2) js.foreach { j =>
          val dt = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
          println(f"  job ${j.id}%3d ${dt}%6.2fs stages=${j.stages}%2d " +
            f"tasks=${j.tasks}%4d ${j.desc.take(80)}")
        }
      }
    }
    spark.stop()
  }
}
