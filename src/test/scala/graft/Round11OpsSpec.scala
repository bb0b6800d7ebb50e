package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Semantic invariants of the round-11 additions — properties the
  * row-hash oracle can't state: HLL register/estimator sanity and its
  * accuracy in the designed regime, KMV's exact-below-k contract and
  * estimator accuracy once the sketch saturates, and the plan shapes
  * (bounded aggregates, broadcast pair frames, no cartesian corpus
  * products).
  */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"
  private val dir01 = "/root/testdata/sf0.01"

  test("sketch_hll: registers bounded, estimate audited") {
    val rows = ScaleOps.sketchHll(spark, dir).collect()
    assert(rows.length == 5) // the five event types
    rows.foreach { r =>
      val (n, est, regs, errBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(regs >= 1 && regs <= 256, "register count bounded by m")
      assert(est > 0)
      assert(errBp == est * 10000 / n - 10000, "err_bp is the audited ratio")
      // sf0.001 sits below the raw-HLL regime boundary (n ≈ 200 <
      // 2.5·m = 640) where the uncorrected estimator biases high —
      // the documented trade for a log-free cross-engine sketch.
      // Bound it loosely here; the designed ±6.5 % band is asserted
      // at sf0.01 below.
      assert(est >= n / 2 && est <= 3 * n,
        s"estimate $est out of loose band around $n")
    }
  }

  test("sketch_hll: designed accuracy in-regime (sf0.01, n >> 2.5m)") {
    val rows = ScaleOps.sketchHll(spark, dir01).collect()
    rows.foreach { r =>
      val (n, errBp) = (r.getLong(1), r.getLong(4))
      assert(n > 640, "sf0.01 must exercise the valid regime")
      // 1.04/sqrt(256) ≈ 6.5 % rsd; assert 3 sigma.
      assert(math.abs(errBp) <= 1950, s"err ${errBp}bp exceeds 3·rsd")
    }
  }

  test("sketch_kmv: below-k sources report exact, pair frame is complete") {
    // Exact counts now come from the SEPARATE audit query (the
    // round-12 split): the estimator's contract is checked by joining
    // the two results, never by the estimator computing its own truth.
    val est = ScaleOps.sketchKmv(spark, dir).collect()
    val exact = ScaleOps.sketchKmvAudit(spark, dir).collect().map { r =>
      (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    }.toMap
    val nSrc = Tables(spark, dir).documents.select(col("source"))
      .distinct().count().toInt
    assert(est.length == nSrc * (nSrc - 1) / 2, "one row per source pair")
    assert(exact.size == est.length, "audit covers the same pair frame")
    est.foreach { r =>
      val (na, nb) = exact((r.getAs[String]("src_a"), r.getAs[String]("src_b")))
      val (estA, estB, uSz, nBoth) = (r.getAs[Long]("est_a"),
        r.getAs[Long]("est_b"), r.getAs[Long]("u_sz"), r.getAs[Long]("n_both"))
      // sf0.001 has 25 distinct texts per source < k=128: the KMV
      // contract says the sketch IS the set — estimates are exact.
      assert(na < 128 && estA == na, "below k the estimate is exact")
      assert(nb < 128 && estB == nb)
      assert(uSz <= 128 && nBoth <= uSz)
      assert(r.getAs[Long]("jacc_est_bp") == nBoth * 10000 / uSz,
        "jacc_est_bp audited")
    }
  }

  test("sketch_kmv: estimator branch live and accurate once saturated (sf0.1)") {
    val sf1 = "/root/testdata/sf0.1"
    val est = ScaleOps.sketchKmv(spark, sf1).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Long]("est_a")).toMap
    ScaleOps.sketchKmvAudit(spark, sf1).collect().foreach { r =>
      val na = r.getAs[Long]("n_a")
      val estA = est((r.getAs[String]("src_a"), r.getAs[String]("src_b")))
      assert(na > 128, "sf0.1 must saturate the sketch")
      // (k−1)/v_k estimator rsd ≈ 1/sqrt(k−1) ≈ 8.9 %; 3 sigma.
      assert(math.abs(estA - na) * 1000 <= na * 270,
        s"KMV estimate $estA vs exact $na outside 27 %")
    }
  }

  test("sketch_kmv estimator plan is sketch-only: no corpus self-join") {
    // The split's whole point: the shipped estimator must not contain
    // the value-keyed dv⋈dv intersection or any exact corpus distinct
    // beyond the sketch build. Every join in the plan is either the
    // broadcast pair/sketch equijoin or a broadcast of a ≤|sources|
    // aggregate — a sort-merge or shuffled-hash join would mean a
    // corpus-sized side sneaked back in.
    val p = ScaleOps.sketchKmv(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"estimator must not join corpus-sized sides:\n$p")
    // The audit query (test-SF calibration only) is where that work lives.
    val a = ScaleOps.sketchKmvAudit(spark, dir)
      .queryExecution.executedPlan.toString
    assert(a.contains("Join"), "audit keeps the exact intersection join")
  }

  test("layout_prune: no false skips — every matching row is scanned") {
    // The data-skipping soundness invariant: a file holding ≥1 row
    // matching a probe's band MUST be marked scan for that probe
    // (min/max stats may over-scan, never under-scan).
    val rows = ScaleOps.layoutPrune(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_match_x") == 0 || r.getAs[Boolean]("scan_x"),
        s"file ${r.getAs[Long]("file_id")} has x matches but skips x")
      assert(r.getAs[Long]("n_match_y") == 0 || r.getAs[Boolean]("scan_y"),
        s"file ${r.getAs[Long]("file_id")} has y matches but skips y")
    }
    // And the layout is doing its job: both probes skip SOME files.
    assert(rows.exists(r => !r.getAs[Boolean]("scan_x")), "x probe skips files")
    assert(rows.exists(r => !r.getAs[Boolean]("scan_y")), "y probe skips files")
  }

  test("sketch_quantile: estimate within one bin below the exact statistic") {
    // est is the lower edge of the bin holding the kth value, so
    // 0 ≤ exact − est < bin_w per quantile — the provable bound the
    // operator's header states.
    val rows = ScaleOps.sketchQuantile(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("bin_w")
      Seq(50, 95, 99).foreach { q =>
        val d = r.getAs[Long](s"exact_p${q}_cents") -
          r.getAs[Long](s"est_p${q}_cents")
        assert(d >= 0 && d < w,
          s"p$q: exact-est=$d outside [0, $w) for ${r.getAs[String]("event_type")}")
      }
    }
  }

  test("sketch plans: bounded aggregates broadcast; corpus never nested-loops") {
    val hll = ScaleOps.sketchHll(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!hll.contains("CartesianProduct"))
    assert(!hll.contains("BroadcastNestedLoopJoin"))
    assert(hll.contains("BroadcastExchange"),
      "the ≤|types| estimate frame must broadcast into the exact side")
    val kmv = ScaleOps.sketchKmv(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!kmv.contains("CartesianProduct"))
    // The ONLY nested loop is the |sources|² pair frame built from two
    // broadcast tiny aggregates; sketch and corpus joins are equijoins.
    assert(!kmv.contains("BroadcastNestedLoopJoin BuildLeft"))
  }
}
