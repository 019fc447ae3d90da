package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming MinHash-LSH near-duplicate detection — the batch banding
  * pipeline ([[graft.queries.Pipeline]] `dedup_minhash_lsh`) in
  * continuous form: each arriving document's band keys probe per-bucket
  * keyed state holding the bucket's FIRST occupant (the cluster
  * representative), emitting one candidate pair (rep, doc) per collided
  * band as it happens.
  *
  * Scale shape: signatures and band keys are row-local
  * ([[graft.pipeline.Dedup.minhashSignature]] +
  * [[graft.pipeline.Dedup.bandKeysFromSignature]] — the SAME hash
  * arithmetic as the batch aggregate path, so stream and batch agree on
  * every bucket id); the only shuffle is the keyed-state exchange on
  * (band, key). State per bucket is TWO longs (representative id +
  * in-order guard) regardless of how many documents hit it — the
  * compare-to-representative policy streaming dedup services run at
  * ingest volume, where the batch all-pairs-within-bucket join is
  * unbounded per batch but the rep compare is O(1) per arrival.
  *
  * In-order contract (the twin convention): documents arrive in
  * ascending doc-id order across micro-batches (in-batch rows are
  * sorted here). Under that contract the first occupant IS the bucket
  * min, so the emitted pair set equals the batch frame "every bucket
  * member paired with its bucket's min id" — NearDupStreamSpec pins the
  * equivalence on chunked feeds. Violations fail fast (the SlidingAgg
  * ADVICE class) instead of silently electing a non-min representative.
  *
  * Relation to the batch candidates: rep pairs are the spanning subset
  * of [[graft.pipeline.Dedup.candidatesFromBuckets]]'s within-bucket
  * cliques (same connected components, fewer edges) — exactly what the
  * downstream union-find needs.
  */
object NearDupStream {

  case class BucketRow(band: Int, key: Long, id: Long)
  case class CandidatePair(repId: Long, docId: Long, band: Int, key: Long)

  private case class RepState(repId: Long, lastId: Long)

  private class RepProcessor(ttl: TTLConfig)
      extends StatefulProcessor[(Int, Long), BucketRow, CandidatePair] {
    @transient private var state: ValueState[RepState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RepState]("rep",
        Encoders.product[RepState], ttl)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BucketRow],
        timerValues: TimerValues): Iterator[CandidatePair] = {
      val sorted = rows.toArray.sortBy(_.id)
      val init = if (state.exists()) state.get() else RepState(-1L, -1L)
      val out = Vector.newBuilder[CandidatePair]
      val fin = sorted.foldLeft(init) { (s, r) =>
        require(r.id > s.lastId,
          s"out-of-order doc for bucket $key: id ${r.id} <= seen ${s.lastId}")
        if (s.repId < 0) RepState(r.id, r.id)
        else {
          out += CandidatePair(s.repId, r.id, r.band, r.key)
          s.copy(lastId = r.id)
        }
      }
      state.update(fin)
      out.result().iterator
    }
  }

  /** Candidate rep pairs over a (band, key, id) bucket-row stream (or,
    * via the same call, a batch Dataset). */
  def candidatePairs(buckets: Dataset[BucketRow],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CandidatePair] = {
    val spark: SparkSession = buckets.sparkSession
    import spark.implicits._
    buckets.groupByKey(r => (r.band, r.key)).transformWithState(
      new RepProcessor(ttl), StateTtl.timeMode(ttl), OutputMode.Append())
  }

  /** Row-local (band, key, id) bucket rows from raw (id, text) — the
    * stream-side twin of [[graft.pipeline.Dedup.minhashBuckets]] (same
    * shingles, same signature mixers, same band hash → identical bucket
    * ids), restructured from aggregate to per-row form so it runs under
    * `readStream`. The signature is materialized once per row; the band
    * explode is row-local. */
  def bucketRows(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    // Empty/whitespace-only docs have NO shingles: the batch path drops
    // them at its explode, so they never reach a bucket. Mirror that
    // here — an unguarded minhashSignature over an empty array yields
    // all-null components whose band hash collapses to the seed,
    // pairing every empty doc with every other (ADVICE r13).
    docs.withColumn("__sh", graft.pipeline.Text.shingles(col(textCol), 3))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", graft.pipeline.Dedup.minhashSignature(col("__sh"), k))
      .select(col(idCol).as("id"),
        explode(graft.pipeline.Dedup.bandKeysFromSignature(
          col("__sig"), bands, k / bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("id"))
  }
}
