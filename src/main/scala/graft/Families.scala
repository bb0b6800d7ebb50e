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
  }
}
