package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: counts the Spark jobs one incremental step runs for a
  * dense and a sparse micro-batch (the step's latency is jobs × planning,
  * not data volume — see README scale notes). Not part of the driver
  * contract; used to verify job-fusion work actually lands.
  */
object StepProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-step-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.limit.initialNumPartitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      // same default as the production projector sessions (see
      // EngineBench.main): interpreted beats per-batch janino at
      // micro-batch sizes
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sites = 4000
    val evts = graft.projector.LogSynth.events(sites)
    val root = graft.util.Scratch.dir("graft-step-probe")
    val store = new graft.streaming.StateStore(spark, s"$root/state")
    graft.streaming.Incremental.seed(store,
      graft.projector.EventLog.decode(graft.projector.LogSynth.toDf(spark, evts)))

    val probeT0 = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("spark.jobGroup.id")))).getOrElse("") + " " +
          js.stageInfos.map(si => si.name.takeWhile(_ != '(') +
            ":" + si.details.linesIterator.drop(1).take(1).mkString.trim.take(80))
            .mkString("|").take(400)
        starts.put(js.jobId, (System.nanoTime(), d)); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, d) =>
          done.add((je.jobId, (t0 - probeT0.get()) / 1e9, (System.nanoTime() - t0) / 1e9, d))
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // real ascending batch ids: the production stream always has one, and
    // batchId >= 0 changes the step's shape (snapshot copies + the early
    // interest launch) — a -1 probe would measure the wrong plan
    var nextBatchId = 0L
    // committed job table (VERDICT r9 #1/#2): round-over-round job-count
    // claims need an artifact, not README prose — one JSON object per
    // probe, written to SPARK_GRAFT_STEPPROBE_OUT next to bench_full.json
    val probeJson = scala.collection.mutable.ArrayBuffer.empty[String]
    def f2(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => " "
      case c if c < ' ' => " "; case c => c.toString } + "\""
    def probe(name: String, batch: Vector[(Long, String, String)]): Unit = {
      done.clear(); starts.clear()
      nextBatchId += 1
      val t0 = System.nanoTime()
      probeT0.set(t0)
      graft.streaming.Incremental.step(store,
        graft.projector.EventLog.decode(graft.projector.LogSynth.toDf(spark, batch)),
        batchId = nextBatchId)
      val secs = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toVector
      println(f"== $name: ${js.size} jobs, $secs%.2f s, sum-of-jobs ${js.map(_._3).sum}%.2f s ==")
      // timeline (start-ordered, offsets from step start): the serial
      // chains and the gaps BETWEEN jobs — driver planning time — are
      // what bounds the 2-second loop, not any one job's duration
      js.sortBy(_._2).take(90).foreach { case (id, st, s, d) =>
        println(f"  [$st%6.2f → ${st + s}%6.2f] ($s%5.2fs) job=$id $d")
      }
      probeJson += s"""{"name":${jq(name)},"events":${batch.size},""" +
        s""""jobs":${js.size},"step_sec":${f2(secs)},""" +
        s""""sum_jobs_sec":${f2(js.map(_._3).sum)},"timeline":[""" +
        js.sortBy(_._2).map { case (id, st, s, d) =>
          s"""{"job":$id,"start":${f2(st)},"dur":${f2(s)},"desc":${jq(d.take(220))}}"""
        }.mkString(",") + "]}"
    }

    // warm one step (JIT, codegen) with a tiny update batch
    probe("warmup-sparse", graft.projector.LogSynth.updates(sites, 50, evts.size + 1L))
    val denseStart = evts.size + 100L
    probe("dense(2117ev)", evts.takeRight(2117).map { case (_, t, p) =>
      (denseStart + 1, t, p) }.zipWithIndex.map { case ((_, t, p), i) =>
      (denseStart + i, t, p) })
    // bench-shaped chunk: EngineBench streams the dense tail in 8 files of
    // ~265 events — the steady-state catchup_batch_median is THIS batch
    // size, where driver planning dominates task time; the 2117-event
    // probe above shows the first-fold shape instead
    val chunkStart = denseStart + 3000L
    probe("dense-chunk(265ev)", evts.takeRight(265).zipWithIndex.map {
      case ((_, t, p), i) => (chunkStart + i, t, p) })
    probe("sparse(500ev)", graft.projector.LogSynth.updates(sites, 500, chunkStart + 5000L))
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STEPPROBE_OUT", "stepprobe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (probeJson.mkString("[", ",\n", "]") + "\n").getBytes("UTF-8"))
    println(s"stepprobe written: $outPath")
    spark.stop()
  }
}
