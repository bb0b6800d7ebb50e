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

  test("sketch stats band verdicts are all true and exacts match") {
    val exact = Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = ScaleOps.sketchStats(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, users) = exact(r.getString(0))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("exact_users") == users)
      for (c <- Seq("users_in_band", "p50_in_band", "p95_in_band"))
        assert(r.getAs[Boolean](c), s"${r.getString(0)}.$c must hold")
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

  test("zorder: morton code matches a reference interleave and preserves locality") {
    val rows = ScaleOps.layoutZorder(spark, dir)
      .join(Tables(spark, dir).orders.select(col("o_orderkey"),
        col("o_custkey"), expr("unix_timestamp(o_orderdate) DIV 86400").as("day")),
        Seq("o_orderkey"))
      .collect()
    assert(rows.nonEmpty)
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    rows.foreach { r =>
      val z = r.getAs[Long]("zval")
      val expect = ref(r.getAs[Long]("o_custkey") % 256, r.getAs[Long]("day") % 256)
      assert(z == expect, s"orderkey ${r.getAs[Long]("o_orderkey")}: $z != $expect")
      assert(r.getAs[Long]("file_id") == (z >>> 6))
      assert(z >= 0 && z < 65536)
    }
    // Locality: rows sharing a file_id span a bounded box in (cust, day)
    // space — a 64-wide z-range covers at most an 8×8 grid cell pair.
    rows.groupBy(_.getAs[Long]("file_id")).foreach { case (_, g) =>
      val xs = g.map(r => r.getAs[Long]("o_custkey") % 256)
      val ys = g.map(r => r.getAs[Long]("day") % 256)
      assert(xs.max - xs.min <= 8 && ys.max - ys.min <= 8,
        "a z-run of 64 codes must stay within one 8x8 spatial cell")
    }
  }

  test("cluster: pair endpoints agree, labels are transitive fixpoints") {
    import graft.operators.Dedup
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lbl = Dedup.dedupCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // Every doc in a pair is labeled; both endpoints share a cluster.
    pairs.foreach { case (a, b) =>
      assert(lbl.contains(a) && lbl.contains(b))
      assert(lbl(a)._1 == lbl(b)._1, s"pair ($a,$b) split across clusters")
    }
    // Reference union-find agrees exactly.
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    lbl.foreach { case (doc, (cid, canon)) =>
      assert(cid == find(doc), s"doc $doc: label $cid vs union-find ${find(doc)}")
      assert(canon == (cid == doc))
    }
  }
}
