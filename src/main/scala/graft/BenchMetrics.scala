package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query resource attribution for the bench record (VERDICT r13 #1 —
  * the r13 driver host measured `pipeline_keep` at 33–116 s IN-SUITE vs
  * 2.0 s forked, and nothing in the record could say whether that was
  * GC, spill, storage-memory eviction, or plain host contention). Every
  * [[Bench.timeOne]] window now captures deltas of the three counters
  * that separate those hypotheses:
  *
  *   - `gc_ms`    — Σ task `jvmGCTime`: GC pressure INSIDE the timed
  *                  tasks (suite-accumulated garbage, undersized heap);
  *   - `spill_mem`/`spill_disk` — Σ task spill bytes: execution-memory
  *                  pressure (partitions too big for the pool);
  *   - `cached_rdds_after`/`cached_mem_after` — `getRDDStorageInfo`
  *                  AFTER the query: lingering cached blocks a released
  *                  operator failed to free (would squeeze later
  *                  queries' execution pool).
  *
  * A query that lingers blocks past the non-blocking-unpersist grace
  * poll (10 s — ADVICE r14: a loaded host's async block removal can
  * exceed a tight grace) surfaces as `cached_rdds_after` > 0 in its
  * metrics and in the headline `cache_leaks` count — a WARNING, never
  * an exit-1 error; CacheHygieneSpec pins per-operator release
  * correctness. Deltas are exact at the window edges: the listener bus
  * is drained ([[org.apache.spark.GraftListenerBridge]]) before reading.
  */
object BenchMetrics {

  final class Probe extends SparkListener {
    val gcMs = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val tasks = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        gcMs.addAndGet(m.jvmGCTime)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        tasks.incrementAndGet()
        ()
      }
    }
    def snap: (Long, Long, Long, Long) =
      (gcMs.get, memSpill.get, diskSpill.get, tasks.get)
  }

  // one probe per SparkContext, installed lazily (both the parent suite
  // and the forked QueryBench child get their own)
  private val probes =
    new java.util.concurrent.ConcurrentHashMap[String, Probe]()

  def ensure(spark: SparkSession): Probe = {
    val sc = spark.sparkContext
    probes.computeIfAbsent(sc.applicationId, _ => {
      val p = new Probe
      sc.addSparkListener(p)
      p
    })
  }

  /** Drain the bus and snapshot the probe (exact window edge). */
  def edge(spark: SparkSession, probe: Probe): (Long, Long, Long, Long) = {
    org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
    probe.snap
  }

  /** Post-query storage check with a grace poll for non-blocking
    * unpersists still in flight: returns (cachedRdds, cachedMemBytes)
    * after up to `graceMs` of settling. */
  def storageAfter(sc: SparkContext, graceMs: Long = 2000L): (Int, Long) = {
    val deadline = System.nanoTime() + graceMs * 1000000L
    var info = sc.getRDDStorageInfo
    while (info.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      info = sc.getRDDStorageInfo
    }
    (info.length, info.map(_.memSize).sum)
  }

  /** One query's deltas as a JSON object fragment. */
  def json(gcMs: Long, spillMem: Long, spillDisk: Long, tasks: Long,
      cachedRdds: Int, cachedMem: Long): String =
    s"""{"gc_ms":$gcMs,"spill_mem":$spillMem,"spill_disk":$spillDisk,""" +
      s""""tasks":$tasks,"cached_rdds_after":$cachedRdds,"cached_mem_after":$cachedMem}"""
}
