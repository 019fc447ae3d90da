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

  test("gap-fill parity with a naive per-user dense-grid model") {
    val hourUs = 3600L * 1000000L
    // sparse timelines (hours 0..30, ~8 events per user) → real gaps;
    // duplicate (user, hour) cells → the last-by-event-id rule matters
    val evGen = Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 30L), Gen.choose(0, 99))
    val evs = Gen.listOfN(32, evGen).sample.get.zipWithIndex.map {
      case ((u, hr, v), i) => (i.toLong, u, hr * hourUs + (i % 7) * 1000L, v / 4.0)
    }
    val got = EventFold.gapFillOf(
        evs.toDF("event_id", "user_id", "ts_us", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = evs.groupBy(_._2).flatMap { case (u, rows) =>
      val byHour = rows.groupBy(_._3 / hourUs)
      val (h0, h1) = (byHour.keys.min, byHour.keys.max)
      var lastV = 0.0
      (h0 to h1).map { h =>
        val cell = byHour.getOrElse(h, Nil)
        if (cell.nonEmpty) lastV = cell.maxBy(_._1)._4
        // the oracle/impl go through DECIMAL(18,2); v/4.0 has ≤2 decimals
        (u, h, cell.size.toLong, lastV)
      }
    }.toSet
    assert(got === expected)
  }

  test("funnel parity with a naive per-user sorted scan") {
    // few users, few types → plenty of users stuck at every stage,
    // including signups with no later view and views before the signup
    val evGen = Gen.zip(Gen.choose(1L, 8L),
      Gen.oneOf("signup", "view", "purchase", "click"))
    val evs = Gen.listOfN(120, evGen).sample.get.zipWithIndex.map {
      case ((u, t), i) => (i.toLong, u, t)
    }
    val got = EventFold.funnelOf(evs.toDF("event_id", "user_id", "event_type"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getInt(4)))
      .toSet
    val expected = evs.groupBy(_._2).map { case (u, rows) =>
      val ordered = rows.sortBy(_._1)
      val s = ordered.find(_._3 == "signup").map(_._1)
      val v = s.flatMap(si => ordered.find(e => e._3 == "view" && e._1 > si).map(_._1))
      val p = v.flatMap(vi => ordered.find(e => e._3 == "purchase" && e._1 > vi).map(_._1))
      val stage = if (p.isDefined) 3 else if (v.isDefined) 2 else if (s.isDefined) 1 else 0
      (u, s, v, p, stage)
    }.toSet
    assert(got === expected)
  }

  test("type-transition parity with a naive per-user sliding-pair model") {
    val evGen = Gen.zip(Gen.choose(1L, 6L), Gen.oneOf("a", "b", "c"))
    val evs = Gen.listOfN(150, evGen).sample.get.zipWithIndex.map {
      case ((u, t), i) => (i.toLong, u, t)
    }
    val got = EventFold.typeTransitionsOf(evs.toDF("event_id", "user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expected = evs.groupBy(_._2).toSeq.flatMap { case (u, rows) =>
      rows.sortBy(_._1).map(_._3).sliding(2).collect {
        case Seq(p, c) => (p, c, u)
      }
    }.groupBy { case (p, c, _) => (p, c) }.map { case ((p, c), hits) =>
      (p, c, hits.size.toLong, hits.map(_._3).distinct.size.toLong)
    }.toSet
    assert(got === expected)
  }
}
