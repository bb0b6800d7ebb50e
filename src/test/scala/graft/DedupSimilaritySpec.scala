package graft

import graft.operators.{Dedup, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the approximate (rows-only-oracle) operators,
  * anchored against their exact counterparts on sf0.001. */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("minhash LSH recalls the high-Jaccard planted pairs") {
    import spark.implicits._
    val exact = Dedup.dedupNgramJaccard(spark, dir)
      .filter($"jaccard_bp" >= 5000)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val cand = Dedup.dedupMinhashLsh(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture has planted near-dups")
    val recall = exact.count(cand.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("simhash candidates are hamming-bounded and include plantedness") {
    import spark.implicits._
    val pairs = Dedup.dedupSimhash(spark, dir)
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 <= 16))
  }

  test("exact dedup keeps one keeper per normalized text") {
    val n = Dedup.dedupExact(spark, dir).count()
    val docs = Tables(spark, dir).documents.count()
    assert(n <= docs && n > 0)
  }

  test("bucketed dedup_embedding recalls the exact near-dup pairs") {
    import spark.implicits._
    val exact = Dedup.dedupEmbeddingExact(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val bucketed = Dedup.dedupEmbedding(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture has cosine near-dups")
    assert(bucketed.subsetOf(exact), "bucketed pairs pass the same exact-cosine verify")
    val recall = exact.count(bucketed.contains).toDouble / exact.size
    assert(recall >= 0.6, s"embedding-LSH recall $recall over ${exact.size} true pairs")
  }

  test("ann_lsh achieves reasonable top-3 recall vs brute force") {
    import spark.implicits._
    val exact = Similarity.annBruteforce(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.annLsh(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.6, s"LSH ANN recall $recall")
  }

  test("ann_ivf achieves reasonable top-3 recall vs brute force") {
    import spark.implicits._
    val exact = Similarity.annBruteforce(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.annIvf(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.3, s"IVF ANN recall $recall")
  }

  test("ann_nndescent strictly improves knn_join's recall@2 in one descent round (sf0.01)") {
    // The graph-index tier's acceptance gate: knn_join's seed edges
    // can never cross an IVF cell, so its recall@2 against the exact
    // all-pairs top-2 graph is structurally capped; one bridge-seeded
    // NN-Descent round must strictly beat it. Uses sf0.01 (500
    // vectors) so the exact graph is cheap to build in-test.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val v = graft.functions.VectorOps.vecs(spark, d)
    val l = v.select($"vec_id", $"v".as("lv"), $"norm".as("ln"))
    val r = v.select($"vec_id".as("nid"), $"v".as("rv"), $"norm".as("rn"))
    val w = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"nid")
    val exact = l.join(r, $"vec_id" =!= $"nid")
      .withColumn("cos",
        graft.functions.VectorOps.dot($"lv", $"rv") / ($"ln" * $"rn"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
      .select($"vec_id", $"nid").as[(Long, Long)].collect().toSet
    val seed = Similarity.knnJoin(spark, d)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val desc = Similarity.annNndescent(spark, d)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val rSeed = exact.count(seed.contains).toDouble / exact.size
    val rDesc = exact.count(desc.contains).toDouble / exact.size
    assert(rDesc > rSeed,
      f"one descent round must strictly improve recall@2: " +
        f"seed $rSeed%.4f -> descent $rDesc%.4f over ${exact.size} edges")
  }

  test("hard_neg_mine recalls the exact miner's negatives like ann_ivf recalls brute force") {
    // The IVF-composed miner must surface a reasonable share of the
    // negatives the exact (bruteforce-scan) miner finds — same anchor
    // relationship as ann_ivf vs ann_bruteforce, same nprobe=2 bound.
    import spark.implicits._
    val exact = Similarity.sampleHardNegatives(spark, dir)
      .select($"query_id", $"neg_id").as[(Long, Long)].collect().toSet
    val mined = Similarity.hardNegMine(spark, dir)
      .select($"query_id", $"neg_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(mined.contains).toDouble / exact.size
    assert(recall >= 0.3, s"IVF hard-negative recall $recall")
    // Every mined negative must genuinely be a label mismatch.
    val labels = Tables(spark, dir).embeddings
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)].collect().toMap
    val rows = Similarity.hardNegMine(spark, dir)
      .select($"query_id", $"neg_id").as[(Long, Long)].collect()
    rows.foreach { case (q, neg) =>
      assert(labels(q) != labels(neg), s"query $q mined same-label negative $neg")
    }
  }

  test("incremental dedup equals the full-batch pairs restricted to the delta") {
    import spark.implicits._
    val cutoff = math.floor(Tables(spark, dir).documents
      .agg(org.apache.spark.sql.functions.max($"doc_id")).head.getLong(0) * 0.9).toLong
    val full = Dedup.dedupMinhashLsh(spark, dir)
      .filter($"doc_b" >= cutoff)
      .select($"doc_a", $"doc_b", $"n_bands").as[(Long, Long, Long)].collect().toSet
    val inc = Dedup.dedupIncremental(spark, dir)
      .select($"doc_a", $"doc_b", $"n_bands").as[(Long, Long, Long)].collect().toSet
    assert(inc == full, "delta-vs-index pairs must match the batch recompute")
    Dedup.dedupIncremental(spark, dir).collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(b >= cutoff, "every pair involves a delta doc")
      assert(r.getAs[String]("kind") ==
        (if (a >= cutoff) "delta-delta" else "base-delta"))
    }
  }

  test("ann_retrieve broadcasts the hit set, never the corpus") {
    import spark.implicits._
    val df = Similarity.annRetrieve(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "payload fetch must be a broadcast-hash probe")
    // Retrieval rides the LSH index: no queries×corpus cosine scoring
    // anywhere in the plan — candidates come from bucket equijoins, so
    // a nested-loop join (the brute-force composition's signature)
    // must not appear.
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "retrieve must compose on the index, not the brute-force baseline")
    // Hits join 1:1 onto their documents.
    val hits = Similarity.annLsh(spark, dir).count()
    assert(df.count() == hits, "every hit resolves to exactly one document")
    df.select($"snippet").as[String].collect()
      .foreach(s => assert(s.length <= 40))
  }

  test("incremental dedup broadcasts the delta, not the index") {
    val p = Dedup.dedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the small increment must broadcast against the corpus-sized index")
  }

  test("ann_sq: int8 scan recalls the exact top-3 well") {
    import spark.implicits._
    // 200 quantization levels on unit-norm vectors barely perturb the
    // ordering; with a 10-deep shortlist the rescored top-3 should
    // nearly always match the exact top-3.
    val exact = Similarity.annBruteforce(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.annSq(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(sq.contains).toDouble / exact.size
    assert(recall >= 0.9, s"SQ ANN recall $recall")
  }
}
