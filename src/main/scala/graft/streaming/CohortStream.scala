package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming cohort-retention feed — the batch retention triangle
  * ([[graft.queries.EventFold]] `evt_cohort_retention`) in continuous
  * form: per user, one `(user, cohort_week, week)` row the FIRST time
  * the user is active in a week. The downstream triangle is then a
  * plain `(cohort_week, offset)` count over this append stream — the
  * heavy lifting (per-user first-seen-week dedup across an unbounded
  * event feed) is what needs keyed state, and it needs only TWO LONGS
  * of it per user.
  *
  * Scale shape: under the in-order feed contract a user's week index is
  * MONOTONE, so "the set of weeks already emitted" collapses to "the
  * last emitted week" — state per user is (cohort_week, last_week),
  * 16 bytes, calendar- and volume-independent (the batch op's
  * collect_set is bounded by the calendar; this is bounded by a
  * constant). Violations fail fast (the twin convention) instead of
  * silently double-counting a week.
  */
object CohortStream {

  case class CohortEvent(userId: Long, tsUs: Long)
  case class CohortHit(userId: Long, cohortWeek: Long, week: Long)
  private case class CohortState(cohortWeek: Long, lastWeek: Long)

  val WeekUs: Long = 7L * 86400L * 1000000L

  private class CohortProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, CohortEvent, CohortHit] {
    @transient private var state: ValueState[CohortState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CohortState]("cohort",
        Encoders.product[CohortState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[CohortEvent],
        timerValues: TimerValues): Iterator[CohortHit] = {
      val out = Vector.newBuilder[CohortHit]
      var s = if (state.exists()) state.get() else null
      rows.toArray.sortBy(_.tsUs).foreach { e =>
        // ts_us >= 0 convention (the cohortRetention div/floor pin)
        val w = e.tsUs / WeekUs
        if (s == null) {
          s = CohortState(w, w)
          out += CohortHit(key, w, w)
        } else {
          require(w >= s.lastWeek,
            s"out-of-order event for user $key: week $w < seen ${s.lastWeek}")
          if (w > s.lastWeek) {
            out += CohortHit(key, s.cohortWeek, w)
            s = s.copy(lastWeek = w)
          }
        }
      }
      if (s != null) state.update(s)
      out.result().iterator
    }
  }

  /** One `(user, cohort_week, week)` row per first activity of a user in
    * a week, across micro-batches. Roll up with
    * `groupBy(cohortWeek, week − cohortWeek).count` for the triangle. */
  def weekHits(events: Dataset[CohortEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CohortHit] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId).transformWithState(new CohortProcessor(ttl),
      StateTtl.timeMode(ttl), OutputMode.Append())
  }
}
