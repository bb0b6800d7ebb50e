package graft

import graft.streaming.StreamRelational
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class Ev(event_id: Long, ts: java.sql.Timestamp, event_type: String)
final case class UserEv(user_id: Long, ts: java.sql.Timestamp)

/** SURVEY §2 #66/#67: stream-stream interval join and watermarked
  * streaming dedup over memory streams. */
class StreamRelationalSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream-stream interval join matches purchases inside the error window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val errs = MemoryStream[Ev]
    val purch = MemoryStream[Ev]
    val out = StreamRelational.purchasesAfterErrors(errs.toDF(), purch.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      errs.addData(Ev(1, ts("2026-01-01 10:00:00"), "error"))
      purch.addData(
        Ev(100, ts("2026-01-01 10:05:00"), "purchase"), // inside
        Ev(101, ts("2026-01-01 10:09:59"), "purchase"), // inside
        Ev(102, ts("2026-01-01 10:10:00"), "purchase"), // boundary: out for err 1
        Ev(103, ts("2026-01-01 09:59:59"), "purchase")) // before: out
      out.processAllAvailable()
      // A later error joining EARLIER purchases still inside its
      // window [10:04, 10:14) — including 102, which err 1 excluded.
      errs.addData(Ev(2, ts("2026-01-01 10:04:00"), "error"))
      out.processAllAvailable()
    } finally out.stop()

    val got = spark.table("ssj").select("err_id", "p_id").as[(Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 100L), (1L, 101L),
      (2L, 100L), (2L, 101L), (2L, 102L)))
  }

  test("left-outer interval join emits unmatched errors after the watermark closes them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val errs = MemoryStream[Ev]
    val purch = MemoryStream[Ev]
    val out = StreamRelational.unmatchedErrorJoin(errs.toDF(), purch.toDF())
      .writeStream.format("memory").queryName("lojoin").outputMode("append").start()
    try {
      errs.addData(
        Ev(1, ts("2026-01-01 10:00:00"), "error"),  // will match 100
        Ev(2, ts("2026-01-01 10:30:00"), "error"))  // never matches
      purch.addData(Ev(100, ts("2026-01-01 10:05:00"), "purchase"))
      out.processAllAvailable()
      // The match emits inner-join-style; err 2's null row must NOT
      // exist yet — the watermark hasn't proven a miss.
      val mid = spark.table("lojoin").select("err_id", "p_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(mid == Set((1L, Some(100L))), s"premature null emission: $mid")

      // Advance both watermarks far past err 2's window: state cleanup
      // must emit the null-extended row for it.
      errs.addData(Ev(9, ts("2026-01-01 12:00:00"), "error"))
      purch.addData(Ev(900, ts("2026-01-01 12:00:00"), "purchase"))
      out.processAllAvailable()
      errs.addData(Ev(10, ts("2026-01-01 13:00:00"), "error"))
      purch.addData(Ev(901, ts("2026-01-01 13:00:00"), "purchase"))
      out.processAllAvailable()
    } finally out.stop()

    val got = spark.table("lojoin").select("err_id", "p_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(got.contains((1L, Some(100L))), s"matched pair missing: $got")
    assert(got.contains((2L, None)), s"unmatched error never emitted: $got")
    assert(!got.contains((2L, Some(100L))) && !got.contains((1L, None)), s"$got")
  }

  test("dropDuplicatesWithinWatermark suppresses at-least-once redelivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val in = MemoryStream[Ev]
    val out = StreamRelational.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("2026-01-01 10:00:00"), "a"),
        Ev(2, ts("2026-01-01 10:00:01"), "b"),
        Ev(1, ts("2026-01-01 10:00:00"), "a")) // same-batch duplicate
      out.processAllAvailable()
      in.addData(
        Ev(1, ts("2026-01-01 10:00:02"), "a"), // cross-batch redelivery
        Ev(3, ts("2026-01-01 10:00:03"), "c"))
      out.processAllAvailable()
    } finally out.stop()

    val ids = spark.table("sdedup").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("native session_window sessionizes a stream, emitting closed sessions") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val in = MemoryStream[UserEv]
    val out = in.toDF()
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("count"))
      .writeStream.format("memory").queryName("ssw").outputMode("append").start()
    try {
      // user 7: two events 10 min apart (one session), then a 40-min
      // silence, then one more (second session).
      in.addData(
        UserEv(7, ts("2026-01-01 10:00:00")),
        UserEv(7, ts("2026-01-01 10:10:00")))
      out.processAllAvailable()
      in.addData(UserEv(7, ts("2026-01-01 10:50:00")))
      out.processAllAvailable()
      // Advance the watermark far enough to close both sessions.
      in.addData(UserEv(7, ts("2026-01-01 12:30:00")))
      out.processAllAvailable()
    } finally out.stop()

    val got = spark.table("ssw")
      .select(col("s").cast("string"), col("e").cast("string"), col("count"))
      .as[(String, String, Long)].collect().toSet
    assert(got.contains(("2026-01-01 10:00:00", "2026-01-01 10:40:00", 2L)),
      s"first session (2 events, end = last+gap): $got")
    assert(got.contains(("2026-01-01 10:50:00", "2026-01-01 11:20:00", 1L)),
      s"second session after the 40-min gap: $got")
  }

  test("stream-static enrichment joins the stream against a broadcast dimension") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // Static dimension from the batch tables; the stream enriches
    // against it per micro-batch — the standard lookup-join shape.
    // The dim is broadcast, so the stream side never shuffles.
    val dim = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("lang"))
    val in = MemoryStream[UserEv]
    val out = in.toDF()
      .join(broadcast(dim), col("user_id") === col("doc_id"))
      .select(col("user_id"), col("lang"))
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      in.addData(UserEv(0, ts("2026-01-01 10:00:00")),
        UserEv(1, ts("2026-01-01 10:00:01")),
        UserEv(999999, ts("2026-01-01 10:00:02"))) // no dim row: dropped
      out.processAllAvailable()
    } finally out.stop()

    val expected = dim.filter(col("doc_id").isin(0L, 1L))
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toSet
    val got = spark.table("enrich").as[(Long, String)].collect().toSet
    assert(got == expected, s"got $got expect $expected")
  }

  test("interval join state is bounded by the watermark (metrics)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val errs = MemoryStream[Ev]
    val purch = MemoryStream[Ev]
    val out = StreamRelational.purchasesAfterErrors(errs.toDF(), purch.toDF())
      .writeStream.format("memory").queryName("ssj_state").outputMode("append").start()
    try {
      // Two batches an hour apart: after the watermark advances past
      // the first window, its buffered rows must be evicted.
      errs.addData(Ev(1, ts("2026-01-01 10:00:00"), "error"))
      purch.addData(Ev(100, ts("2026-01-01 10:01:00"), "purchase"))
      out.processAllAvailable()
      errs.addData(Ev(2, ts("2026-01-01 11:30:00"), "error"))
      purch.addData(Ev(200, ts("2026-01-01 11:31:00"), "purchase"))
      out.processAllAvailable()
      // One more batch so eviction (driven by the advanced watermark)
      // lands in the recorded progress.
      errs.addData(Ev(3, ts("2026-01-01 11:40:00"), "error"))
      out.processAllAvailable()
      val last = out.lastProgress
      val state = last.stateOperators
      assert(state.nonEmpty)
      val rows = state.map(_.numRowsTotal).sum
      // Live set after the watermark (11:21) clears batch 1: errors 2
      // and 3 (×2 bucket rows each) + purchase 200 = 5. Without
      // eviction all 9 fed rows (3 errors ×2 + 3 purchases) linger.
      assert(rows <= 5, s"stale join state not evicted: $rows rows buffered")
    } finally out.stop()
  }
}
