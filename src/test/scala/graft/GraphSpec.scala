package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reusable fixpoint loop and the graph operators built on it. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  /** Both directions of an undirected edge list as a DataFrame. */
  private def edgeDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  test("connectedComponents labels a long chain (pointer jumping works)") {
    // A 40-node path needs ~40 rounds with plain neighbor-min; pointer
    // jumping must finish it well inside the 50-round cap.
    val chain = edgeDf((0L until 39L).map(i => (i, i + 1)))
    val lbl = Graph.connectedComponents(chain, "chainTest").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.size == 40)
    assert(lbl.values.forall(_ == 0L), "one component rooted at the min node")
  }

  test("connectedComponents separates disjoint components") {
    val lbl = Graph
      .connectedComponents(edgeDf(Seq((1L, 2L), (2L, 3L), (10L, 11L))), "twoComp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents on an empty edge set returns no rows") {
    val empty = edgeDf(Seq.empty)
    assert(Graph.connectedComponents(empty, "emptyTest").count() == 0)
  }

  test("graph_components agrees with dedup_cluster's label frame") {
    val stats = Graph.graphComponents(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val clusters = Dedup.dedupCluster(spark, dir)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"), max(col("doc_id")).as("mx")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats.keySet == clusters.keySet)
    stats.foreach { case (cid, (nDocs, nEdges, maxDoc)) =>
      assert((nDocs, maxDoc) == clusters(cid))
      // A connected n-node component has between n−1 and n(n−1)/2 edges.
      assert(nEdges >= nDocs - 1 && nEdges <= nDocs * (nDocs - 1) / 2,
        s"component $cid: $nEdges edges for $nDocs docs")
    }
  }

  test("iterate releases every superseded round's checkpoint blocks") {
    // After the loop, only the FINAL round's blocks may remain
    // persisted (they back the returned frame); every earlier round
    // must have been unpersisted — the round-4 leak regression, where
    // accumulated checkpoint blocks degraded an unrelated downstream
    // query 6×. A 20-node chain runs several rounds, so a leak shows
    // up as several extra persisted RDDs.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val chain = edgeDf((0L until 20L).map(i => (i, i + 1)))
    val result = Graph.connectedComponents(chain, "hygieneTest")
    result.count() // materialize the caller's action
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"leaked checkpoint RDDs beyond the final round: ${leaked.size}")
  }
}
