package graft.queries

import graft.SparkTestBase
import org.scalacheck.Gen

/** Randomized parity for the trailing-window rolling aggregate
  * ([[EventFold.slidingAggOf]]): the keyed RANGE frame must equal a naive
  * per-event scan of the same user's trailing hour — including the peer
  * rule (events at the SAME microsecond include each other in both
  * directions, the part a ROWS frame would get wrong).
  */
class EventFoldSpec extends SparkTestBase {
  import spark.implicits._

  test("scalacheck parity with the naive trailing-hour scan (duplicate-ts heavy)") {
    val hourUs = 3600L * 1000000L
    // coarse time grid in half-hour steps → plenty of exact ties and
    // windows that straddle the hour boundary exactly
    val evGen = Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 10L), Gen.choose(0, 50))
    val evs = Gen.listOfN(300, evGen).sample.get.zipWithIndex.map {
      case ((u, slot, v), i) => (i.toLong, u, slot * (hourUs / 2), v.toDouble)
    }
    val got = EventFold.slidingAggOf(
        evs.toDF("event_id", "user_id", "ts_us", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = evs.map { case (id, u, t, _) =>
      val in = evs.filter(e => e._2 == u && e._3 > t - hourUs && e._3 <= t)
      (id, u, in.size.toLong, in.map(_._4).sum)
    }.toSet
    assert(got === expected)
  }
}
