package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 operator semantics: the knn_seed fixture's equivalence to
  * its in-plan derivation, and NN-Descent's convergence curve
  * (ann_nndescent_conv — the capped-fixpoint completion of round-15's
  * single round). */
class Round16OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("knn_join rides the knn_seed fixture without changing its rows") {
    // The registered query reads the checkpointed fixture; the builder
    // plan (knnSeedPlans._1) derives the same edges in-plan. Any drift
    // between them (stale fixture, wrong checkpoint) breaks here.
    val fromFixture = Similarity.knnJoin(spark, dir)
      .select("vec_id", "rank", "neighbor_id", "cos_bp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val fromPlan = Similarity.knnSeedPlans(spark, dir)._1
      .select("vec_id", "rank", "neighbor_id", "cos_bp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(fromFixture == fromPlan,
      "fixture-backed knn_join must equal its in-plan derivation")
  }

  test("ann_nndescent_conv: recall@k is monotone and round 1 equals ann_nndescent") {
    val rows = Similarity.annNndescentConv(spark, dir)
      .orderBy(col("round"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L), "one row per round")
    // Monotone recall: candidates always include the current edges and
    // a true top-k neighbor, once kept, is only ever displaced by
    // another true top-k neighbor.
    val recalls = rows.map(_._4).toSeq
    assert(recalls == recalls.sorted,
      s"recall@k must be non-decreasing across rounds: $recalls")
    // Round 1 IS ann_nndescent: same seed, same hop/union/re-score.
    val r1Edges = rows.head._2
    val nnd = Similarity.annNndescent(spark, dir).count()
    assert(r1Edges == nnd,
      s"round-1 edge count ($r1Edges) must equal ann_nndescent's ($nnd)")
  }

  test("ann_nndescent_conv: n_new shrinks toward fixpoint on the test corpus") {
    val nNew = Similarity.annNndescentConv(spark, dir)
      .orderBy(col("round")).collect().map(_.getLong(2)).toSeq
    // The descent must make progress round over round; on the pinned
    // sf0.001 corpus it reaches an exact fixpoint (n_new = 0) within
    // the 3-round cap — the convergence the readout exists to show.
    assert(nNew.last < nNew.head,
      s"edge churn must shrink across rounds: $nNew")
    assert(nNew.last == 0L,
      s"sf0.001 must reach fixpoint within ${nNew.size} rounds: $nNew")
  }
}
