package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 #69/#70: sequence-pattern detection and time-series
  * gap fill — invariants the row-level oracle can't state. */
class EventsExtSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("ev_pattern matches are truly adjacent error→purchase steps") {
    import spark.implicits._
    // Sort on epoch-MICROseconds — the operator's window orders by the
    // full-precision ts; a floored-seconds sort could disagree on
    // same-second neighbors. The gap check stays on floored seconds
    // (that is what the operator outputs).
    val seq = Tables(spark, dir).events
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        unix_timestamp($"ts").as("ep"), $"event_type")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.sortBy(r => (r._3, r._2)).toList
      }
    val expect = (for {
      (_, rows) <- seq.toSeq
      (cur, nxt) <- rows.zip(rows.drop(1))
      if cur._5 == "error" && nxt._5 == "purchase" && nxt._4 - cur._4 <= 3600
    } yield (cur._2, nxt._4 - cur._4)).toSet
    val got = Events.evPattern(spark, dir)
      .select($"err_id", $"gap_sec").as[(Long, Long)].collect().toSet
    assert(got == expect, s"got ${got.size} expect ${expect.size}")
  }

  test("ev_pattern_quant agrees with a brute-force 3-step scan") {
    import spark.implicits._
    val seq = Tables(spark, dir).events
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        unix_timestamp($"ts").as("ep"), $"event_type")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._2)).toVector)
    val expect = (for {
      (_, rows) <- seq.toSeq
      i <- rows.indices if rows(i)._5 == "error"
      j = rows.indexWhere(_._5 == "purchase", i + 1) if j >= 0
      gap = rows(j)._4 - rows(i)._4 if gap <= 172800
      clicks = rows.slice(i + 1, j).count(_._5 == "click") if clicks >= 1
    } yield (rows(i)._2, gap, clicks.toLong)).toSet
    val got = Events.evPatternQuant(spark, dir)
      .select($"err_id", $"gap_sec", $"n_clicks_between")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect, s"got ${got.size} expect ${expect.size}")
  }

  test("ts_fill: complete hourly grid per type after its first datum; fills carry last value") {
    import spark.implicits._
    val rows = Events.tsFill(spark, dir)
      .select($"event_type", $"hour_epoch", $"sum_cents", $"filled")
      .as[(String, Long, Long, Boolean)].collect()
    val maxEpoch = rows.map(_._2).max
    rows.groupBy(_._1).foreach { case (t, g) =>
      val sorted = g.sortBy(_._2)
      // Grid completeness: no missing hours between first datum and global max.
      val hours = sorted.map(_._2)
      assert(hours.last == maxEpoch, s"$t: grid must reach the global span end")
      assert(hours.zip(hours.drop(1)).forall { case (a, b) => b - a == 3600 },
        s"$t: hourly grid has gaps")
      // Forward fill: a filled row repeats the previous row's value.
      sorted.zip(sorted.drop(1)).foreach { case ((_, _, prev, _), (_, ep, v, f)) =>
        if (f) assert(v == prev, s"$t@$ep: filled value $v != previous $prev")
      }
    }
  }

  test("seqMatch compiles a 3-anchor pattern with greedy earliest anchors") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // user 1: a@0, b@10(click@5 between), c@20 → match, 1 click before b,
    //         0 after. user 2: a@0 then c@10 but NO b → no match.
    // user 3: a@0, b@10 with no click between → fails fill(click>=1).
    // user 4: a@0, click@5, b@10, c@5000000 → outside the window.
    val ev = Seq(
      (1L, 1L, t(0), "a"), (1L, 2L, t(5), "click"), (1L, 3L, t(10), "b"),
      (1L, 4L, t(15), "click"), (1L, 5L, t(20), "c"),
      (2L, 10L, t(0), "a"), (2L, 11L, t(10), "c"),
      (3L, 20L, t(0), "a"), (3L, 21L, t(10), "b"), (3L, 22L, t(20), "c"),
      (4L, 30L, t(0), "a"), (4L, 31L, t(5), "click"), (4L, 32L, t(10), "b"),
      (4L, 33L, t(5000000), "c")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Events.seqMatch(ev,
      anchors = Seq(col("event_type") === "a", col("event_type") === "b",
        col("event_type") === "c"),
      fills = Seq((col("event_type") === "click", 1),
        (col("event_type") === "click", 0)),
      windowSec = 3600)
      .select($"user_id", $"a1_id", $"a2_epoch", $"a3_epoch", $"gap_sec",
        $"n_fill_0", $"n_fill_1").as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 1L, 10L, 20L, 20L, 1L, 1L)),
      s"expected exactly user 1's chain, got $got")
  }
}
