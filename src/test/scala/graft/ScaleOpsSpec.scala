package graft

import graft.operators.{Cdc, ScaleOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the oracle can't state for the scale-shaped operators:
  * plan shape (the range join must not be a nested loop), the
  * salted-join equivalence, sketch error bounds, and the CDC identity
  * (incremental merge == full recompute). */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("range join compiles to an equijoin, never a nested loop") {
    val p = plan(ScaleOps.q24RangeJoin(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join must bucket into an equijoin")
  }

  test("range join counts match a per-row check") {
    val out = ScaleOps.q24RangeJoin(spark, dir).cache()
    try {
      val ev = Tables(spark, dir).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("ts")).collect().map(_.getTimestamp(0).getTime)
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts")).collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
      val got = out.select(col("err_id"), col("n_purchases")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == errs.keySet, "one output row per error event")
      for ((id, start) <- errs) {
        val expect = purchases.count(p => p >= start && p < start + 600000L)
        assert(got(id) == expect, s"err $id: got ${got(id)} expect $expect")
      }
    } finally out.unpersist()
  }

  test("salted join equals the unsalted join") {
    val t = Tables(spark, dir)
    val plain = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"))
    val salted = ScaleOps.q25SkewSalt(spark, dir)
      .select(col("o_orderpriority"), col("n_items"))
    assert(salted.except(plain).count() == 0 &&
      plain.except(salted).count() == 0,
      "salting must not change join semantics")
  }

  test("sketch stats bound the exact answers") {
    val exact = Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val rows = ScaleOps.sketchStats(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (users, lo, hi) = exact(r.getString(0))
      val approx = r.getLong(1)
      assert(math.abs(approx - users) <= math.max(3, (users * 0.15).toLong),
        s"${r.getString(0)}: HLL $approx vs exact $users")
      for (c <- Seq("p50_cents", "p95_cents")) {
        val v = r.getAs[Long](c)
        assert(v >= math.floor(lo * 100) && v <= math.ceil(hi * 100 + 1),
          s"${r.getString(0)}.$c=$v outside [$lo,$hi]")
      }
    }
  }

  test("cdc incremental merge equals the full recompute") {
    val full = Cdc.cdcLatest(spark, dir)
    val merged = Cdc.cdcMerge(spark, dir)
      .select(col("user_id"), col("last_type"), col("last_epoch"),
        col("last_value_cents"))
    assert(merged.except(full).count() == 0 && full.except(merged).count() == 0,
      "applying the delta to the base snapshot must equal recomputing from scratch")
  }

  test("cdc merge src column is consistent with the cutoff") {
    val anyDelta = Tables(spark, dir).events
      .filter(col("ts") >= lit("2024-01-15 00:00:00"))
      .select(col("user_id")).distinct()
    val claimed = Cdc.cdcMerge(spark, dir)
      .filter(col("src") === "delta").select(col("user_id"))
    assert(claimed.except(anyDelta).count() == 0 &&
      anyDelta.except(claimed).count() == 0)
  }
}
