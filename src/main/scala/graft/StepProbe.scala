package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** TEMPORARY profiling main: where does a single Incremental.step spend
  * its time? Counts Spark jobs and wall-clock between them. */
object StepProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-step-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val evts = graft.projector.LogSynth.events(300)
    val cut = evts((evts.size * 6 / 10) - 1)._1
    val (prefix, tail) = evts.partition(_._1 <= cut)
    val root = java.nio.file.Files.createTempDirectory("graft-step-probe").toFile.getPath
    val store = new graft.streaming.StateStore(spark, s"$root/state")
    graft.streaming.Incremental.seed(store,
      graft.projector.EventLog.decode(graft.projector.LogSynth.toDf(spark, prefix)))

    val batch = tail.take(160)
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val sites = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val bytes = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, j.time)
        sites.put(j.jobId, j.stageInfos.lastOption.map(_.name).getOrElse("?"))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        nJobs.incrementAndGet()
        Option(starts.get(j.jobId)).foreach { t0 =>
          val ms = j.time - t0
          jobMs.addAndGet(ms)
          val key = Option(sites.get(j.jobId)).getOrElse("?")
          bytes.merge(key, (1, ms), (a, b) => (a._1 + b._1, a._2 + b._2))
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    (0 until 3).foreach { i =>
      nJobs.set(0); jobMs.set(0); bytes.clear()
      val t0 = System.nanoTime()
      val decoded = graft.projector.EventLog.decode(graft.projector.LogSynth.toDf(spark, batch))
      graft.streaming.Incremental.step(store, decoded, batchId = 100L + i)
      val wallSec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"probe: step $i wall ${wallSec}%.2f s, jobs ${nJobs.get()}, " +
        f"in-job ${jobMs.get() / 1000.0}%.2f s, gap ${wallSec - jobMs.get() / 1000.0}%.2f s")
      if (i == 2) {
        import scala.jdk.CollectionConverters._
        bytes.asScala.toSeq.sortBy(-_._2._2).take(25).foreach { case (k, (n, ms)) =>
          System.err.println(f"probe:   $k%-55s n=$n%3d  ${ms / 1000.0}%.2f s")
        }
      }
    }
    spark.stop()
  }
}
