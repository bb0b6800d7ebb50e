package graft

/** Shared query-grouping used by both harness mains (Bench, Verify):
  * fixture-sharing and same-table queries group together so a chunk's
  * session-scoped fixtures (Trike frames, Dedup shingles/signatures)
  * build once, and oversized families split at a cap so no chunk's
  * session lives long enough to accumulate JVM pressure (the round-9
  * lesson: one 167-query session made late families report 3–8× their
  * isolated cost).
  */
object Families {

  /** Family key: qN_* all share the TPC-H tables and group as "rel";
    * everything else groups by its key prefix. */
  def family(key: String): String =
    if (key.matches("q\\d+_.*")) "rel"
    else {
      val p = key.takeWhile(_ != '_')
      if (p.isEmpty) key else p
    }

  /** Stable chunking: families in name order, each family's queries in
    * name order, oversized families split — every run processes the
    * same query in the same chunk position. */
  def chunked[A](all: Seq[(String, A)], cap: Int): Seq[Seq[(String, A)]] =
    all.sortBy(_._1)
      .groupBy { case (name, _) => family(name) }
      .toSeq.sortBy(_._1)
      .flatMap { case (_, qs) => qs.grouped(cap) }

  /** Drop chunk-scoped fixture references into the dying context so a
    * stop()+gc() actually releases their blocks. */
  def invalidateFixtures(): Unit = {
    graft.operators.Dedup.invalidate()
    graft.operators.Trike.invalidate()
    graft.operators.Graph.invalidate()
    graft.operators.Similarity.invalidate()
  }

  /** Fixture-build ledger (the round-13 fix for fixture attribution):
    * each session-scoped fixture getter records (name, seconds) here
    * when it actually BUILDS — memoized hits record nothing — so Bench
    * can report fixture builds as their own line items instead of
    * charging them to whichever query touches the fixture first in its
    * chunk (round-13's driver-vs-builder "regressions" were exactly
    * such attribution flips: graph_clustering 0.55 s vs 3.78 s, same
    * code, different chunk paying the shared pair-graph build). */
  private val fixtureTimes =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]

  def recordFixtureBuild(name: String, secs: Double): Unit =
    fixtureTimes.add((name, secs))

  /** Drain (name, seconds) entries recorded since the last drain. A
    * name can repeat across drains — each chunk's fresh session
    * rebuilds its fixtures. */
  def drainFixtureTimes(): Seq[(String, Double)] = {
    val b = Seq.newBuilder[(String, Double)]
    var e = fixtureTimes.poll()
    while (e != null) { b += e; e = fixtureTimes.poll() }
    b.result()
  }

  /** Time `build`, record it in the ledger, return its result. */
  def timedFixture[A](name: String)(build: => A): A = {
    val t0 = System.nanoTime()
    val r = build
    recordFixtureBuild(name, (System.nanoTime() - t0) / 1e9)
    r
  }
}
