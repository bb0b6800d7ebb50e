package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Semantic invariants of the round-10 additions — properties the
  * row-hash oracle can't state (MAD fence symmetry, water-fill budget
  * conservation with both branches live, label-propagation share
  * closure, BPE pair-order totality), on sf0.001. */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("q37_mad: fence is robust — outliers bounded, med within value range") {
    val rows = RelationalExt.q37Mad(spark, dir).collect()
    assert(rows.length == 5) // the five market segments
    rows.foreach { r =>
      val (n, medX2, madX4, nOut, bp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(madX4 >= 0, "MAD is non-negative by construction")
      // A 3-MAD fence over any distribution excludes at most ~1/9 by
      // Chebyshev-for-MAD heuristics; assert the much weaker bound
      // that the robust fence never flags a majority.
      assert(nOut * 2 < n, s"fence flagged a majority: $nOut of $n")
      assert(bp == nOut * 10000 / n)
      // Median (doubled) sits inside the doubled min/max of the data.
      val seg = r.getString(0)
      val vals = Tables(spark, dir).customer
        .filter(col("c_mktsegment") === seg)
        .select(Relational.cents(col("c_acctbal"))).collect().map(_.getLong(0))
      assert(medX2 >= 2 * vals.min && medX2 <= 2 * vals.max)
    }
  }

  test("mix_waterfill: allocations conserve the budget, both branches live") {
    val rows = Pipeline.mixWaterfill(spark, dir).collect()
    val docs = Tables(spark, dir).documents
      .agg(sum(col("n_chars"))).collect()(0).getLong(0)
    val budget = docs * 3 / 4
    assert(rows.map(_.getLong(2)).sum == budget, "Σalloc must equal budget")
    val sat = rows.filter(_.getLong(3) == 1L)
    val unsat = rows.filter(_.getLong(3) == 0L)
    assert(sat.nonEmpty, "the saturated branch must be exercised")
    assert(unsat.nonEmpty, "the level branch must be exercised")
    // Saturated languages are taken whole; unsaturated get a common
    // level (±1 for the Hamilton remainder) that exceeds every
    // saturated language's full supply.
    sat.foreach(r => assert(r.getLong(2) == r.getLong(1)))
    val levels = unsat.map(_.getLong(2))
    assert(levels.max - levels.min <= 1, "common level ±1")
    assert(sat.forall(_.getLong(1) <= levels.min))
    unsat.foreach(r => assert(r.getLong(2) < r.getLong(1),
      "an unsaturated language must not be taken whole"))
  }

  test("text_bpe_pairs: top-k is totally ordered, pairs are 2-char") {
    val rows = TextAnalysis.textBpePairs(spark, dir).collect()
    assert(rows.length == 40)
    rows.foreach(r => assert(r.getString(0).length == 2))
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "descending count order")
    // The cut is deterministic: the last kept count either exceeds or
    // ties the first excluded one; on ties the pair string breaks
    // them, so re-running yields the identical set.
    assert(rows.map(_.getString(0)).distinct.length == 40)
  }

  test("text_boilerplate: fractions in (0, 10000], only multi-doc shingles count") {
    val rows = TextAnalysis.textBoilerplate(spark, dir).collect()
    assert(rows.nonEmpty, "the dup-heavy corpus must surface boilerplate")
    rows.foreach { r =>
      val (nSh, nB, bp) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nB > 0 && nB <= nSh)
      assert(bp == nB * 10000 / nSh && bp > 0 && bp <= 10000)
    }
  }

  test("graph_label_prop: per-seed shares close to 10000 bp ±rounding") {
    val rows = Graph.graphLabelProp(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val tot = rs.map(_.getLong(3)).sum
      // Each cell floors independently: total ≤ 10000, short by at
      // most one bp per cell.
      assert(tot <= 10000 && tot > 10000 - rs.length)
    }
    // Propagation must actually move labels somewhere on this
    // dup-heavy corpus: some off-diagonal cell exists.
    assert(rows.exists(r => r.getString(0) != r.getString(1)),
      "no label ever propagated across a source boundary")
  }

  test("cdc_compact: kept+dropped reconcile, horizon is the K-th newest") {
    val rows = Cdc.cdcCompact(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, dropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept + dropped == n)
      assert(kept == math.min(n, 3L))
    }
    // Spot-check one hot user: horizon equals the 3rd-newest event ts.
    val u = rows.maxBy(_.getLong(1))
    val ts = Tables(spark, dir).events
      .filter(col("user_id") === u.getLong(0))
      .select(unix_timestamp(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(u.getLong(4) == ts.takeRight(3).head)
  }

  test("sample_epoch_order: each epoch is a full permutation, epochs decorrelated") {
    val rows = Pipeline.sampleEpochOrder(spark, dir).collect()
    val nDocs = Tables(spark, dir).documents.count()
    val byEpoch = rows.groupBy(_.getLong(0))
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.foreach { case (_, rs) =>
      assert(rs.length == nDocs)
      // pos is a dense 1..n permutation index and doc_ids are unique.
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to nDocs))
      assert(rs.map(_.getLong(2)).distinct.length == nDocs)
    }
    // The two epochs are different permutations (decorrelated hash
    // salts): identical orders would defeat the epoch shuffle.
    val o0 = byEpoch(0L).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    val o1 = byEpoch(1L).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    assert(o0 != o1)
  }

  test("text_lang_confusion: rows close in bp, cells account for every doc") {
    val rows = TextAnalysis.textLangConfusion(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val tot = rs.map(_.getLong(3)).sum
      // Each cell floors independently: total ≤ 10000, short by at
      // most one bp per cell.
      assert(tot <= 10000 && tot > 10000 - rs.length)
    }
    assert(rows.map(_.getLong(2)).sum ==
      Tables(spark, dir).documents.count(), "cells partition the corpus")
    // The corpus is English-like word soup under every `lang` tag, so
    // the matrix cannot show per-language diagonals — but the en
    // markers (the/and/of) are real: within the actual-en row the
    // en cell must dominate, and no non-profile label may appear.
    val cells = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val enDiag = cells.getOrElse(("en", "en"), 0L)
    cells.collect { case (("en", p), v) if p != "en" => v }
      .foreach(v => assert(v <= enDiag, "en off-diagonal beats en diagonal"))
    val allowed = Set("en", "es", "de", "fr", "zh", "und")
    assert(rows.map(_.getString(1)).forall(allowed))
  }
}
