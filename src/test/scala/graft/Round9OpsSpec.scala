package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Semantic invariants of the round-9 additions — properties the
  * row-hash oracle can't state (Bloom no-false-negatives, curriculum
  * stage monotonicity, EMA convexity, correlation bounds), on
  * sf0.001. */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("text_bm25: scores descend and every hit contains a query term") {
    val rows = TextAnalysis.textBm25(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getLong(2))
    assert(scores.sameElements(scores.sortBy(-_)), "descending score order")
    val hitIds = rows.map(_.getLong(0)).toSet
    val texts = Tables(spark, dir).documents
      .filter(col("doc_id").isin(hitIds.toSeq: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hitIds.foreach { id =>
      val t = " " + texts(id) + " "
      assert(Seq("spark", "join", "vector").exists(q => t.contains(" " + q + " ")),
        s"doc $id matched without any query term")
    }
  }

  test("text_collocation: support floor and lift ordering hold") {
    val rows = TextAnalysis.textCollocation(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(1) >= 5, "support floor")
      assert(r.getLong(1) <= math.min(r.getLong(2), r.getLong(3)),
        "pair count bounded by either unigram count")
    }
    val lifts = rows.map(_.getLong(4))
    assert(lifts.sameElements(lifts.sortBy(-_)), "descending lift")
  }

  test("ev_islands matches a direct per-user streak recount") {
    val got = Events.evIslands(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val days = Tables(spark, dir).events
      .select(col("user_id"), datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == days.keySet)
    days.foreach { case (u, ds) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (start, len)
      var start = ds.head; var len = 1L
      ds.sliding(2).foreach {
        case Array(a, b) =>
          if (b == a + 1) len += 1
          else { runs += ((start, len)); start = b; len = 1 }
        case _ => ()
      }
      runs += ((start, len))
      val maxLen = runs.map(_._2).max
      val expected = (ds.size.toLong, runs.size.toLong, maxLen,
        runs.filter(_._2 == maxLen).map(_._1).min)
      assert(got(u) == expected, s"user $u: ${got(u)} vs $expected")
    }
  }

  test("ev_interarrival: min <= avg <= max and variance non-negative") {
    val rows = Events.evInterarrival(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx, avg, vr) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(mn <= avg && avg <= mx, s"user ${r.getLong(0)}: $mn <= $avg <= $mx")
      assert(vr >= 0, "integer variance must be non-negative")
    }
  }

  test("q35_corr: correlation bounded, matches Spark corr() to 1 bp") {
    val rows = RelationalExt.q35Corr(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getLong(3)) <= 10000))
    val ref = Tables(spark, dir).lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(corr(col("l_quantity"), floor(col("l_extendedprice"))).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val expect = math.floor(ref((r.getString(0), r.getString(1))) * 10000)
      assert(math.abs(r.getLong(3) - expect) <= 1,
        s"corr_bp ${r.getLong(3)} vs spark corr $expect")
    }
  }

  test("filter_bloom: zero false negatives, fp column consistent") {
    val rows = ScaleOps.filterBloom(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hit, actual, fp) = (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))
      assert(!actual || hit, s"false negative at custkey ${r.getLong(0)}")
      assert(fp == (hit && !actual))
    }
    // The filter must actually filter: misses exist at this SF.
    assert(rows.exists(r => !r.getBoolean(1)))
  }

  test("decontam_minhash: one row per benchmark doc, flags consistent") {
    val rows = Dedup.decontamMinhash(spark, dir).collect()
    assert(rows.nonEmpty, "per-bench report must never be empty")
    val benchDocs = rows.map(_.getLong(0))
    assert(benchDocs.forall(_ % 5 == 0))
    rows.foreach { r =>
      val (nCand, bestTrain, bestEst, contaminated) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(bestEst >= 0 && bestEst <= 10000)
      assert(contaminated == (bestEst >= 5000))
      if (nCand == 0) assert(bestTrain == -1L && bestEst == 0L)
      else assert(bestTrain >= 0 && bestTrain % 5 != 0,
        "best candidate must come from the train split")
    }
    // The % 5 split must leave the pair-scoring path exercised: at
    // every SF some bench doc has at least one train candidate (the
    // r8 % 50 split left exactly ONE pair at sf0.01 — one data tweak
    // from an untested path).
    assert(rows.exists(_.getLong(1) > 0), "no train×bench candidate pairs")
  }

  test("sample_curriculum: stages partition by difficulty, seq dense per stage") {
    val rows = Pipeline.sampleCurriculum(spark, dir).collect()
    assert(rows.length == Tables(spark, dir).documents.count())
    val byStage = rows.groupBy(_.getLong(3))
    assert(byStage.keySet.forall(s => s >= 1 && s <= 10))
    byStage.foreach { case (_, rs) =>
      val seqs = rs.map(_.getLong(5)).sorted
      assert(seqs.sameElements(1L to rs.length.toLong), "dense seq per stage")
    }
    val bounds = byStage.toSeq.sortBy(_._1)
      .map { case (s, rs) => (s, rs.map(_.getLong(2)).min, rs.map(_.getLong(2)).max) }
    bounds.sliding(2).foreach {
      case Seq((_, _, maxA), (_, minB, _)) =>
        assert(maxA <= minB, "stage difficulty must be monotone")
      case _ => ()
    }
  }

  test("graph_cc_hist: sizes account for every node of the pair graph") {
    val hist = Graph.graphCcHist(spark, dir).collect()
    assert(hist.nonEmpty)
    val accounted = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    val nodes = Dedup.dedupCluster(spark, dir).count()
    assert(accounted == nodes,
      s"histogram covers $accounted nodes, graph has $nodes")
    // Pair-graph components have >= 2 members by construction.
    assert(hist.forall(_.getLong(0) >= 2))
  }

  test("graph_assortativity: single bounded calibration row") {
    val rows = Graph.graphAssortativity(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) > 0, "pair graph must have edges at sf0.001")
    assert(math.abs(rows(0).getLong(1)) <= 10000)
  }

  test("mix_reweight: weights invert shares and cover all docs") {
    val rows = Pipeline.mixReweight(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == Tables(spark, dir).documents.count())
    // weight strictly decreases as share increases (inverse relation)
    val byShare = rows.sortBy(_.getLong(2))
    val weights = byShare.map(_.getLong(4))
    assert(weights.sameElements(weights.sorted.reverse),
      "over-represented languages must get smaller weights")
    // a language exactly at target share would get weight 10000
    rows.foreach { r =>
      val (share, target, w) = (r.getLong(2), r.getLong(3), r.getLong(4))
      if (share < target) assert(w >= 10000)
    }
  }

  test("ann_hybrid_rrf: dense ranks, descending fusion scores, bounded pts") {
    val rows = Similarity.annHybridRrf(spark, dir).collect()
    assert(rows.nonEmpty)
    val maxPts = 2L * (10000L / 61L) // rank-1 in both lists
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(1L to sorted.length.toLong),
        s"query $q: ranks must be dense from 1")
      val scores = sorted.map(_.getLong(3))
      assert(scores.sameElements(scores.sortBy(-_)), s"query $q: rrf descending")
      scores.foreach(s => assert(s > 0 && s <= maxPts))
    }
  }

  test("ev_path: trigram counts bounded by total adjacent triples") {
    val rows = Events.evPath(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "descending count order")
    // Σ over ALL paths = Σ_users max(n_u - 2, 0); top-10 is a subset
    val perUser = Tables(spark, dir).events
      .groupBy("user_id").count().collect().map(_.getLong(1))
    val totalTriples = perUser.map(n => math.max(n - 2, 0L)).sum
    assert(counts.sum <= totalTriples)
    rows.foreach(r => assert(r.getString(0).split(">").length == 3))
  }

  test("ev_burstiness: Fano positive and consistent with a recompute") {
    val rows = Events.evBurstiness(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tot, fano) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 1 && tot >= n)
      assert(fano >= 0, s"${r.getString(0)}: variance is non-negative")
    }
  }

  test("text_diversity: simpson/ttr bounds and word-count parity") {
    val rows = TextAnalysis.textDiversity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, types, ttr, simp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(types <= n && types >= 1)
      assert(ttr >= 0 && ttr <= 10000)
      assert(simp >= 0 && simp < 10000, "simpson < 1 (some word repeats or n=1)")
      // single-type doc => simpson 0
      if (types == 1) assert(simp == 0)
    }
  }

  test("text_filter_gate: reasons decompose and keep matches reasons==0") {
    val rows = TextAnalysis.textFilterGate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, wl10, reasons, keep) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(reasons >= 0 && reasons <= 15)
      assert((keep == 1) == (reasons == 0))
      if ((reasons & 1) != 0) assert(n < 10)
      if ((reasons & 2) != 0) assert(n > 2000)
      if ((reasons & 8) != 0) assert(wl10 < 30 || wl10 > 100)
    }
    // the synthetic corpus is clean prose: most docs should survive
    assert(rows.count(_.getLong(4) == 1) > rows.length / 2)
  }

  test("sketch_cms: estimate never undercounts and grid is bounded") {
    val rows = ScaleOps.sketchCms(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS min-of-counters can only OVERestimate (user ${r.getLong(0)})")
      assert(r.getLong(3) >= 0, "over_bp non-negative")
    }
  }

  test("ev_autocorr: r1 bounded, pair count matches grid span") {
    val rows = Events.evAutocorr(spark, dir).collect()
    assert(rows.nonEmpty)
    val nTypes = Tables(spark, dir).events
      .select("event_type").distinct().count()
    assert(rows.length == nTypes)
    val pairCounts = rows.map(_.getLong(1)).distinct
    assert(pairCounts.length == 1, "all types share the same global grid")
    rows.foreach(r => assert(math.abs(r.getLong(2)) <= 10000))
  }

  test("ev_forecast: totals consistent, MAE bounded by worst case") {
    val rows = Events.evForecast(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, actual, pred, mae) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n > 0 && actual >= 0 && pred >= 0)
      // MAE*n/100 <= total_actual + total_pred (triangle inequality)
      assert(mae * n <= (actual + pred) * 100)
    }
    // test span: 30-day data minus 21 train days = 9 days of hours
    assert(rows.head.getLong(1) >= 8 * 24 && rows.head.getLong(1) <= 10 * 24)
  }

  test("cdc_staleness: buckets partition all keys, ages within bands") {
    val rows = Cdc.cdcStaleness(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalKeys = Tables(spark, dir).events
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == totalKeys)
    val bands = Map("0_lt1h" -> (0L, 3600L), "1_lt6h" -> (3600L, 21600L),
      "2_lt1d" -> (21600L, 86400L), "3_lt3d" -> (86400L, 259200L),
      "4_ge3d" -> (259200L, Long.MaxValue))
    rows.foreach { r =>
      val (lo, hi) = bands(r.getString(0))
      assert(r.getLong(2) >= lo && r.getLong(3) < hi,
        s"bucket ${r.getString(0)}: [${r.getLong(2)},${r.getLong(3)}]")
    }
  }

  test("graph_2hop: ranks dense, common bounded by degree, flags honest") {
    val rows = Graph.graph2hop(spark, dir).collect()
    assert(rows.nonEmpty)
    val edges = Dedup.dedupMinhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    rows.groupBy(_.getLong(0)).foreach { case (node, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length.toLong))
      rs.foreach { r =>
        val (rec, common, isNew) = (r.getLong(2), r.getLong(3), r.getBoolean(4))
        assert(common <= math.min(deg(node), deg(rec)),
          "common neighbors bounded by either endpoint degree")
        assert(isNew == !edges.contains((node, rec)), "novelty flag honest")
      }
    }
  }

  test("dedup_keep_best: keeps the longest member of every cluster") {
    val rows = Dedup.dedupKeepBest(spark, dir).collect()
    assert(rows.nonEmpty)
    val labels = Dedup.dedupCluster(spark, dir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val chars = Tables(spark, dir).documents
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = labels.groupBy(_._2)
    rows.foreach { r =>
      val (cid, n, kept, keptChars, dropped) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val members = byCluster(cid).map(_._1)
      assert(members.length == n.toInt)
      assert(members.forall(m => chars(m) <= keptChars),
        s"cluster $cid: kept doc must be longest")
      assert(chars(kept) == keptChars)
      assert(dropped == members.map(chars).sum - keptChars)
    }
  }

  test("ev_ab_test: assignment partitions users, z consistent with counts") {
    val r = Events.evAbTest(spark, dir).collect()
    assert(r.length == 1)
    val (na, ca, nb, cb, z) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    val users = Tables(spark, dir).events.select("user_id").distinct().count()
    assert(na + nb == users, "every user lands in exactly one arm")
    assert(ca <= na && cb <= nb)
    // z sign must agree with the observed rate difference
    if (ca * nb > cb * na) assert(z >= 0)
    if (ca * nb < cb * na) assert(z <= 0)
  }

  test("sample_hard_negatives: negatives always cross labels, ranks dense") {
    val rows = Similarity.sampleHardNegatives(spark, dir).collect()
    assert(rows.nonEmpty)
    val labels = Tables(spark, dir).embeddings
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length.toLong))
      rs.foreach { r =>
        assert(labels(r.getLong(2)) != labels(q),
          s"negative ${r.getLong(2)} shares query $q's label")
        assert(r.getInt(3) == labels(r.getLong(2)), "reported label correct")
      }
    }
  }

  test("ann_diverse: per-query labels are unique and scores descend") {
    val rows = Similarity.annDiverse(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val labs = sorted.map(_.getInt(3))
      assert(labs.distinct.length == labs.length,
        "diversification: one representative per label")
      val scores = sorted.map(_.getLong(4))
      assert(scores.sameElements(scores.sortBy(-_)))
      assert(rs.length <= 5)
    }
  }

  test("ts_changepoint: peak is a true CUSUM maximum per type") {
    val rows = Events.tsChangepoint(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "grid has hours")
      assert(r.getLong(3) >= 0, "|S| peak non-negative")
    }
    // every type of the table is reported exactly once
    val nTypes = Tables(spark, dir).events
      .select("event_type").distinct().count()
    assert(rows.length == nTypes)
  }

  test("mix_source_overlap: pair counts reconcile with the pair graph") {
    val rows = Pipeline.mixSourceOverlap(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalPairs = Dedup.dedupMinhashLsh(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == totalPairs,
      "per-source-pair counts sum to the full candidate pair count")
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "pair key normalized")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000)
    }
  }

  test("ts_ema: EMA stays within the user's observed value range") {
    val ema = Events.tsEma(spark, dir).collect()
    assert(ema.nonEmpty)
    val range = Tables(spark, dir).events
      .select(col("user_id"), floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
      .groupBy("user_id").agg(min("v_c").as("mn"), max("v_c").as("mx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // convexity is per-window; the per-user envelope is implied (and
    // floor() can undershoot the true min by at most 1)
    ema.foreach { r =>
      val (mn, mx) = range(r.getLong(0))
      assert(r.getLong(3) >= mn - 1 && r.getLong(3) <= mx,
        s"ema ${r.getLong(3)} outside [$mn,$mx] for user ${r.getLong(0)}")
    }
  }
}
