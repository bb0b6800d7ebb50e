package graft

import graft.operators.{Pipeline, RelationalExt}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the relational extensions and the
  * training-data pipeline operators — properties the DuckDB oracle
  * can't state (set algebra identities, determinism across runs,
  * distribution bounds). */
class ExtOperatorsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("intersect ∪ except partitions the distinct left side") {
    val inter = RelationalExt.q19Intersect(spark, dir)
    val exc = RelationalExt.q20Except(spark, dir)
    val left = Tables(spark, dir).orders
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey")).distinct()
    assert(inter.count() + exc.count() == left.count())
    assert(inter.intersect(exc).count() == 0)
  }

  test("cube grand-total row equals the orders row count") {
    val all = RelationalExt.q18Cube(spark, dir)
      .filter(col("priority") === "ALL" && col("status") === "ALL")
      .select(col("n_orders")).head().getLong(0)
    assert(all == Tables(spark, dir).orders.count())
  }

  test("pivot row totals equal the per-priority spend") {
    val pivoted = RelationalExt.q17Pivot(spark, dir)
      .select(sum(col("f_cents") + col("o_cents") + col("p_cents")))
      .head().getLong(0)
    // Within rounding slack: cents() quantizes per status-branch sum,
    // so the pivoted total may differ from the global by <1 cent per
    // (priority × status) cell.
    val direct = Tables(spark, dir).orders
      .agg(graft.operators.Relational.cents(sum(col("o_totalprice"))))
      .head().getLong(0)
    assert(math.abs(pivoted - direct) <= 15, s"pivot=$pivoted direct=$direct")
  }

  test("ntile quartiles within a brand are balanced to ±1") {
    val bad = RelationalExt.q22Ntile(spark, dir)
      .groupBy(col("p_brand"))
      .agg((max(col("n_parts")) - min(col("n_parts"))).as("spread"))
      .filter(col("spread") > 1)
    assert(bad.count() == 0)
  }

  test("correlated rows all clear the 1%-above-brand-average bar") {
    val out = RelationalExt.q23Correlated(spark, dir)
    val viol = out.filter(col("price_cents") * 1000 <= col("brand_avg_cents") * 1010)
    assert(viol.count() == 0)
    assert(out.count() > 0, "threshold must select at least one part at sf0.001")
  }

  test("split_hash partitions every document, ~80/10/10, deterministically") {
    val s = Pipeline.splitHash(spark, dir).cache()
    try {
      val total = Tables(spark, dir).documents.count()
      assert(s.count() == total)
      val bys = s.groupBy(col("split")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bys.values.sum == total)
      val trainFrac = bys.getOrElse("train", 0L).toDouble / total
      assert(trainFrac > 0.6 && trainFrac < 0.95, s"train frac $trainFrac")
      // Determinism: a second evaluation assigns identical splits.
      assert(Pipeline.splitHash(spark, dir).except(s).count() == 0)
    } finally s.unpersist()
  }

  test("stratified sample is a subset at a plausible rate in every stratum") {
    val sample = Pipeline.sampleStratified(spark, dir)
    val perLang = sample.groupBy(col("lang")).count()
      .join(Tables(spark, dir).documents.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total")), "lang")
    // 15% target; small strata swing, so only bound it away from
    // "empty" and "everything".
    val bad = perLang.filter(col("count") * 100 > col("n_total") * 60)
    assert(bad.count() == 0)
    assert(sample.count() > 0)
  }

  test("temperature sampling keeps all of the rarest language and thins the biggest") {
    import spark.implicits._
    val out = Pipeline.sampleTemperature(spark, dir)
    val perLang = out.groupBy($"lang")
      .agg(count(lit(1)).as("kept"), first($"thr_bp").as("thr_bp"))
      .join(Tables(spark, dir).documents.groupBy($"lang")
        .agg(count(lit(1)).as("n_total")), "lang")
      .select($"lang", $"kept", $"thr_bp", $"n_total")
      .as[(String, Long, Long, Long)].collect()
    val rarest = perLang.minBy(_._4)
    assert(rarest._3 == 10000 && rarest._2 == rarest._4,
      s"rarest language keeps everything: $rarest")
    val biggest = perLang.maxBy(_._4)
    assert(biggest._3 < 10000 && biggest._2 < biggest._4,
      s"dominant language must be thinned: $biggest")
    // Observed keep rate tracks the declared threshold (hash uniform).
    perLang.foreach { case (lang, kept, thr, total) =>
      val expect = total.toDouble * thr / 10000
      assert(math.abs(kept - expect) <= math.max(5.0, expect * 0.5),
        s"$lang: kept $kept vs expected ~$expect at thr $thr")
    }
  }

  test("pack_chunks conserves tokens and numbers chunks contiguously") {
    val chunks = Pipeline.packChunks(spark, dir).cache()
    try {
      val packed = chunks.agg(sum(col("chunk_tokens"))).head().getLong(0)
      val direct = Tables(spark, dir).documents
        .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
      assert(packed == direct, "packing must not drop or duplicate tokens")
      val gaps = chunks.groupBy(col("lang"))
        .agg(min(col("chunk_id")).as("lo"), max(col("chunk_id")).as("hi"),
          count(lit(1)).as("n"))
        .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
      assert(gaps.count() == 0, "chunk ids must be 0..n-1 per language")
    } finally chunks.unpersist()
  }

  test("doc_pipeline never outputs more docs than exist and dedups exactly") {
    val t = Tables(spark, dir).documents.filter(length(col("text")) >= 200)
    val expect = t.groupBy(md5(col("text"))).agg(count(lit(1))).count()
    val got = Pipeline.docPipeline(spark, dir)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(got == expect, "one surviving doc per distinct text")
  }
}
