package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev harness (r17): run one SparkEntry query by name with a
  * SparkListener attached and print the job/stage/task accounting —
  * jobs, stages, tasks, summed executorRunTime, scheduler-visible
  * shuffle bytes, and the max single-task time. Wall time alone is
  * misleading at sf0.1 (~15 MB of parquet): the listener separates
  * real compute (executorRunTime) from per-task and per-stage
  * scheduling overhead, and exposes skew (maxTaskMs vs avg).
  * Usage: runMain graft.TaskStats <queryName>[,<queryName>...] [sfDir] [reps]
  */
object TaskStats {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.TaskStats <queryName>[,...] [sfDir] [reps]")
      sys.exit(2)
    }
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val bad = names.filterNot(SparkEntry.queries.contains)
    if (bad.nonEmpty) {
      System.err.println(s"unknown queries: ${bad.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").collect()

    val perJob = sys.env.get("SPARK_GRAFT_TASKSTATS_JOBS").contains("1")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val runMs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    val shufReadB = new AtomicLong(0L)
    val shufWriteB = new AtomicLong(0L)
    val fetchWaitMs = new AtomicLong(0L)
    val maxTaskMs = new AtomicLong(0L)
    val deserMs = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) jobStart.put(j.jobId, j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (perJob) {
          val t0 = jobStart.getOrDefault(j.jobId, j.time)
          println(f"  JOB ${j.jobId}%4d ${(j.time - t0) / 1e3}%7.3fs")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (perJob) {
          val info = s.stageInfo
          val m = Option(info.taskMetrics)
          val run = m.map(_.executorRunTime / 1e3).getOrElse(-1.0)
          val sr = m.map(_.shuffleReadMetrics.totalBytesRead / 1e6)
            .getOrElse(-1.0)
          val sw = m.map(_.shuffleWriteMetrics.bytesWritten / 1e6)
            .getOrElse(-1.0)
          println(f"  STAGE ${info.stageId}%4d tasks=${info.numTasks}%4d " +
            f"runSec=$run%7.2f shufRd=$sr%7.1fMB shufWr=$sw%7.1fMB " +
            f"${info.name.take(60)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          deserMs.addAndGet(m.executorDeserializeTime)
          shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          var cur = maxTaskMs.get()
          while (m.executorRunTime > cur &&
            !maxTaskMs.compareAndSet(cur, m.executorRunTime)) {
            cur = maxTaskMs.get()
          }
        }
      }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); runMs.set(0)
        gcMs.set(0); shufReadB.set(0); shufWriteB.set(0)
        fetchWaitMs.set(0); maxTaskMs.set(0); deserMs.set(0)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = try CacheScope.scoped { fn(spark, sfDir).count() }
        catch { case e: Throwable => println(s"ERR $name: $e"); -1L }
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are posted async (listenerBus.waitUntilEmpty
        // is private[spark]); a short settle keeps the counts honest —
        // task-end events for an already-finished action post in ms
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
        println(f"TASKSTATS $name rep=$i rows=$n wall=$wall%.3f " +
          f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
          f"execRunSec=${runMs.get / 1e3}%.2f gcSec=${gcMs.get / 1e3}%.2f " +
          f"deserSec=${deserMs.get / 1e3}%.2f " +
          f"maxTaskSec=${maxTaskMs.get / 1e3}%.2f " +
          f"fetchWaitSec=${fetchWaitMs.get / 1e3}%.2f " +
          f"shufReadMB=${shufReadB.get / 1e6}%.1f shufWriteMB=${shufWriteB.get / 1e6}%.1f")
      }
    }
    spark.stop()
  }
}
