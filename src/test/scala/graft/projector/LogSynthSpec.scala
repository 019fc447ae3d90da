package graft.projector

import graft.SparkTestBase

/** The engine-bench log generator must produce a decodable, referentially
  * ordered envelope log that populates all 8 projected tables — otherwise
  * the BASELINE.md engine metrics time an unrepresentative fold. */
class LogSynthSpec extends SparkTestBase {

  test("synthetic log decodes and populates every projected table") {
    val evts = LogSynth.events(sites = 60)
    assert(evts.map(_._1) === (1L to evts.size.toLong), "seqs not contiguous")
    val decoded = EventLog.decode(LogSynth.toDf(spark, evts))
    val (tables, release) = Derivations.deriveAllCached(decoded)
    try {
      tables.foreach { case (name, df) =>
        assert(df.count() > 0, s"table $name empty on the synthetic log")
      }
      val inst = tables("installation").count()
      assert(inst === 60L, s"expected one installation per site, got $inst")
    } finally { release(); () }
  }

  test("chunked write produces flat per-chunk files with contiguous seqs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-logsynth-spec").toFile
    val evts = LogSynth.events(sites = 20)
    LogSynth.write(spark, dir.getPath, evts, chunks = 5)
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 5)
    val back = spark.read.schema(LogSynth.envelopeSchema).parquet(dir.getPath)
      .orderBy("seq").collect().map(_.getLong(0))
    assert(back.toSeq === (1L to evts.size.toLong))
  }
}
