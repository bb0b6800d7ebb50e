package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative DataFrame fixpoint loops with checkpoint-block hygiene,
  * plus the graph operators built on them (connected components over
  * the near-duplicate pair graph).
  *
  * The iterative-DataFrame pattern needs a lineage truncation per
  * round (else the plan doubles every iteration), and localCheckpoint
  * is the cheap way to get one — but each checkpoint materializes RDD
  * blocks that the ContextCleaner releases only lazily. Round 4
  * measured the cost of skipping explicit cleanup: leaked blocks from
  * dedup_cluster's loop degraded an unrelated downstream query 6×.
  * `iterate` therefore releases round N−1's blocks as soon as round N
  * is materialized (the convergence action doubles as the
  * materializer, one Spark job per round), and keeps only the FINAL
  * round's blocks — which the returned frame still depends on —
  * retiring them at the next `iterate` call, mirroring the
  * predecessor-unpersist discipline of Dedup's signature cache.
  */
object Graph {

  /** Blocks backing the most recently returned frame; they must
    * outlive the caller's action, so they are released lazily on the
    * next iterate() call (sequential Verify/Bench holds at most one
    * loop's final round at a time). */
  private var retired: Seq[RDD[_]] = Nil

  /** The checkpoint RDDs a frame's plan rests on (a lazily
    * localCheckpoint'ed Dataset plans as a LogicalRDD). Shared with
    * Trike's session-scoped fixture cache, which uses the same
    * materialize-then-release discipline. */
  private[graft] def ckptRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.logical.collect { case l: LogicalRDD => l.rdd }

  private def releaseRetired(): Unit = synchronized {
    retired.foreach(_.unpersist(blocking = false))
    retired = Nil
  }

  /** Run `step` to a fixpoint: halts when `measure` (ONE action per
    * round — it is also what materializes the round's lazy checkpoint)
    * returns the same value twice in a row. Fails loudly at
    * `maxRounds` rather than returning a partial fixpoint. Frames
    * `step` references besides its argument (e.g. the edge set) should
    * be persisted by the caller — they are re-read every round. */
  def iterate[S](init: DataFrame, maxRounds: Int, opName: String)(
      step: DataFrame => DataFrame)(measure: DataFrame => S): DataFrame = {
    releaseRetired()
    var cur = init.localCheckpoint(eager = false)
    var curRdds = ckptRdds(cur)
    var prev: Option[S] = None
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val next = step(cur).localCheckpoint(eager = false)
      val nextRdds = ckptRdds(next)
      val m = measure(next)
      // `next` is self-contained once measured; the previous round's
      // blocks are dead weight from here on.
      curRdds.foreach(_.unpersist(blocking = false))
      cur = next
      curRdds = nextRdds
      converged = prev.contains(m)
      prev = Some(m)
      rounds += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[$opName] round $rounds measure=$m converged=$converged")
    }
    require(converged, s"$opName: did not converge in $maxRounds rounds")
    synchronized { retired = curRdds }
    cur
  }

  /** Connected components by min-label propagation with
    * pointer jumping — the DataFrame rendition of the alternating
    * large-star/small-star algorithms in Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014. O(log d) rounds;
    * per-round state is bounded by the EDGE set (never the corpus).
    *
    * `edges` must hold both directions of every edge (src, dst) and
    * should be persisted by the caller (it is joined every round).
    * Returns (node, lbl): lbl = the component's minimum node id.
    * Convergence: labels are monotone non-increasing positive ids, so
    * an unchanged label sum ⇔ a fixpoint. Pointer jumping (adopt the
    * label OF my label — every label is itself a node) doubles the
    * propagation distance per round, so maxRounds=50 covers diameters
    * past 2^49. */
  def connectedComponents(
      edges: DataFrame, opName: String, maxRounds: Int = 50): DataFrame = {
    val init = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    iterate(init, maxRounds, opName) { labels =>
      val nbrMin = edges.join(labels, edges("src") === labels("node"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nlbl"))
      val propagated = labels.join(nbrMin, labels("node") === nbrMin("dst"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val m = propagated.select(col("node").as("k"), col("lbl").as("v"))
      propagated.join(m, propagated("lbl") === m("k"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("v"), col("lbl"))).as("lbl"))
    } { df =>
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0))
        .map(BigDecimal(_))
    }
  }

  // ─── graph_components: per-component stats over the pair graph ───
  // Downstream of clustering, a dedup pipeline reports its component
  // structure (how big are the duplicate groups? how densely
  // connected?) before electing canonicals. One CC run + two
  // aggregations over the edge/label frames; n_edges counts each
  // undirected edge once.
  def graphComponents(spark: SparkSession, dir: String): DataFrame = {
    val edges = Dedup.pairEdges(spark, dir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val labels = connectedComponents(edges, "graphComponents")
      val sizes = labels.groupBy(col("lbl").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"), max(col("node")).as("max_doc"))
      val edgeCounts = edges.join(labels, edges("src") === labels("node"))
        .groupBy(col("lbl").as("cluster_id"))
        .agg((count(lit(1)) / 2).cast("long").as("n_edges"))
      sizes.join(edgeCounts, Seq("cluster_id"))
        .select(col("cluster_id"), col("n_docs"), col("n_edges"), col("max_doc"))
        .orderBy(col("cluster_id"))
    } finally edges.unpersist(blocking = false)
  }

  val graphComponentsSql: String =
    s"""WITH RECURSIVE ${Dedup.ccReachCtes},
       |comp AS (SELECT node AS doc_id, MIN(x) AS cluster_id
       |         FROM reach GROUP BY node),
       |sizes AS (SELECT cluster_id, count(*) AS n_docs, max(doc_id) AS max_doc
       |          FROM comp GROUP BY cluster_id),
       |ec AS (SELECT c.cluster_id, CAST(count(*) // 2 AS BIGINT) AS n_edges
       |       FROM edges e JOIN comp c ON e.src = c.doc_id
       |       GROUP BY c.cluster_id)
       |SELECT s.cluster_id, s.n_docs, ec.n_edges, s.max_doc
       |FROM sizes s JOIN ec ON s.cluster_id = ec.cluster_id
       |ORDER BY s.cluster_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_components" -> graphComponents)

  val oracle: Map[String, String] = Map(
    "graph_components" -> graphComponentsSql)
}
