package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-family operator registries; every key in
  * `queries` with a DuckDB-expressible semantic also appears in
  * `oracleSql` (the correctness gate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalExt.queries ++ Events.queries ++
      TextAnalysis.queries ++ Pipeline.queries ++
      ScaleOps.queries ++ Cdc.queries ++ Fuzzy.queries ++
      Trike.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ Graph.queries ++
      Map("shard_journal" ->
        ((s: SparkSession, d: String) => graft.sources.ShardedJournal.shardJournal(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ RelationalExt.oracle ++ Events.oracle ++
      TextAnalysis.oracle ++ Pipeline.oracle ++
      ScaleOps.oracle ++ Cdc.oracle ++ Fuzzy.oracle ++
      Trike.oracle ++ Dedup.oracle ++ Similarity.oracle ++
      Multimodal.oracle ++ Graph.oracle ++
      Map("shard_journal" -> graft.sources.ShardedJournal.shardJournalSql())
}
