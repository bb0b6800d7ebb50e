package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Semantic invariants of the round-8 additions — properties the
  * row-hash oracle can't state (exactness of the apportionment total,
  * cohort monotonicity, mode dominance, knn ordering), on sf0.001. */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("mix_apportion allocations sum to the budget EXACTLY") {
    val total = Pipeline.mixApportion(spark, dir)
      .agg(sum("alloc_tokens")).head.getLong(0)
    assert(total == 1000000L, s"largest-remainder must be exact, got $total")
  }

  test("split_kfold covers every document exactly once across 5 folds") {
    val df = Pipeline.splitKfold(spark, dir)
    val folds = df.select("fold").distinct.collect.map(_.getLong(0)).toSet
    assert(folds.subsetOf((0L until 5L).toSet))
    val n = df.agg(sum("n_docs")).head.getLong(0)
    assert(n == Tables(spark, dir).documents.count())
  }

  test("ev_cohort: week 0 is each cohort's peak (every member is active)") {
    val rows = Events.evCohort(spark, dir)
      .groupBy("cohort_wk")
      .agg(max(when(col("week_offset") === 0, col("n_users"))).as("w0"),
        max(when(col("week_offset") > 0, col("n_users"))).as("later"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w0 = r.getLong(1)
      val later = if (r.isNullAt(2)) 0L else r.getLong(2)
      assert(w0 >= later, s"cohort ${r.get(0)}: w0=$w0 < later=$later")
    }
  }

  test("q32_mode matches a direct recount") {
    val expected = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (flag, rows) =>
        val best = rows.minBy(r => (-r.getLong(2), r.getDouble(1)))
        flag -> (math.floor(best.getDouble(1) * 100 + 0.5).toLong, best.getLong(2))
      }
    val got = RelationalExt.q32Mode(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("knn_join: ranks are ordered by cosine and bounded by k") {
    val rows = Similarity.knnJoin(spark, dir).collect()
    assert(rows.nonEmpty)
    val byVec = rows.groupBy(_.getLong(0))
    byVec.foreach { case (_, rs) =>
      assert(rs.length <= 2)
      val sorted = rs.sortBy(_.getLong(1))
      val cosines = sorted.map(_.getLong(4))
      assert(cosines.sameElements(cosines.sortBy(-_)),
        "rank order must follow descending cosine")
      cosines.foreach(c => assert(c <= 10000L))
    }
    // Neighbors never leave the blocking cell (within-cell semantics).
    val cellOf = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { r =>
      cellOf.get(r.getLong(2)).foreach(nc => assert(nc == r.getLong(3)))
    }
  }

  test("cdc_audit: changes are bounded by writes, spans non-negative") {
    val rows = Cdc.cdcAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(1), "n_changes must be < n_writes")
      assert(r.getLong(3) >= 0L)
      assert(r.getLong(4) >= 1L)
    }
  }

  test("text_zipf: the top term sits exactly on the Zipf reference line") {
    val first = TextAnalysis.textZipf(spark, dir)
      .filter(col("rank") === 1).head
    assert(first.getLong(3) == 10000L) // n·1·10⁴ DIV n = 10⁴
  }

  test("ev_topk_day emits at most 3 ranked rows per day, peak first") {
    val rows = Events.evTopkDay(spark, dir).collect()
    val byDay = rows.groupBy(_.getLong(0))
    byDay.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getLong(4))
      val values = byRank.map(_.getLong(2))
      assert(values.sameElements(values.sortBy(-_)))
    }
  }

  test("ev_dwell: min ≤ mean ≤ max per type") {
    Events.evDwell(spark, dir).collect().foreach { r =>
      val mean = r.getLong(2) / 100.0
      assert(r.getLong(3) <= mean && mean <= r.getLong(4),
        s"${r.getString(0)}: ${r.getLong(3)} ≤ $mean ≤ ${r.getLong(4)}")
    }
  }

  test("ev_rfm: quintiles in [1,5], balanced within one row") {
    val rows = Events.evRfm(spark, dir).collect()
    assert(rows.nonEmpty)
    Seq(4, 5, 6).foreach { i =>
      val scores = rows.map(_.getLong(i))
      assert(scores.forall(s => s >= 1 && s <= 5))
      // ntile balance: bucket sizes differ by at most 1.
      val sizes = scores.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"col $i sizes: $sizes")
    }
  }

  test("text_hashvec: dims bounded, counts conserve tokens") {
    val rows = TextAnalysis.textHashvec(spark, dir).collect()
    assert(rows.forall { r => val d = r.getLong(1); d >= 0 && d < 256 })
    val totalHashed = rows.map(_.getLong(2)).sum
    val totalTokens = Tables(spark, dir).documents
      .select(size(filter(split(col("text"), " "), w => w =!= ""))
        .cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(totalHashed == totalTokens,
      s"hashing must conserve token mass: $totalHashed vs $totalTokens")
  }

  test("dedup_est_error: calibration row is sane") {
    val r = Dedup.dedupEstError(spark, dir).head
    assert(r.getLong(0) > 0, "some candidate pairs must overlap")
    assert(r.getLong(1) >= 0 && r.getLong(1) <= 10000)
    assert(r.getLong(2) >= r.getLong(1), "max ≥ mean")
  }

  test("ev_seasonality: shares sum to ~10000 bp over the full matrix") {
    val shares = Events.evSeasonality(spark, dir)
      .agg(sum("share_bp"), sum("n")).head
    val total = shares.getLong(0)
    // Each cell floors, so the sum undershoots by at most one bp per cell.
    val nCells = Events.evSeasonality(spark, dir).count()
    assert(total <= 10000L && total >= 10000L - nCells,
      s"share mass must be ~1: $total bp over $nCells cells")
  }

  test("text_readability: fewer words per sentence scores higher") {
    val rows = TextAnalysis.textReadability(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1 && r.getLong(3) >= 1)
    }
    // The score is monotone decreasing in words-per-sentence when
    // syllables-per-word is held fixed — check the formula directly
    // on two synthetic parts rather than hoping the corpus has a
    // controlled pair.
    def score(wpsC: Long, spwC: Long) = 20682L - wpsC * 101 / 100 - spwC * 8460 / 100
    assert(score(500, 150) > score(2000, 150))
    assert(score(500, 150) > score(500, 250))
  }

  test("mix_apportion and sample_balanced agree with direct recounts") {
    val k = Pipeline.sampleBalanced(spark, dir)
      .groupBy("lang").count().collect()
    val sizes = k.map(_.getLong(1)).toSet
    assert(sizes.size == 1, s"every class must end at the same size: $sizes")
    val minClass = Tables(spark, dir).documents
      .groupBy("lang").count().agg(min("count")).head.getLong(0)
    assert(sizes.head == minClass)
  }
}
