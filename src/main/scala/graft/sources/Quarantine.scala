package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Malformed-record quarantine for semi-structured ingest — the
  * operational half of schema-on-read that `Tables`' parquet path
  * never needs: a JSONL/CSV feed at 100 TB ALWAYS contains lines that
  * don't parse, and the two failure modes a pipeline must separate
  * are (a) unparseable lines, which must be captured whole for
  * re-processing — never dropped, never crashing the job — and
  * (b) rows that parse but carry a mistyped field — for JSON input
  * Spark treats these as corrupt too (the whole line lands in the
  * corrupt column; CSV PERMISSIVE nulls the field instead), so the
  * quarantine captures BOTH and the re-drive decides which were
  * structural and which were schema drift.
  *
  * Spark plumbing notes this wrapper encodes so callers don't relearn
  * them:
  *  - the corrupt column must be ADDED to the user schema before the
  *    read; asking for it without declaring it returns no column;
  *  - a query whose pruned schema is ONLY the corrupt column is
  *    rejected by Spark ("referenced columns only include the
  *    internal corrupt record column"); the documented contract is
  *    parse-once-then-reuse, so readJsonl persists the parsed frame
  *    (MEMORY_AND_DISK) — which is also the right ingest shape: one
  *    parse feeds the clean write AND the quarantine write, and the
  *    caller unpersists when both are materialized;
  *  - quarantine rows carry the source file (input_file_name) so a
  *    re-drive targets exactly the bad shards.
  */
object Quarantine {

  private val corruptCol = "_corrupt_record"

  /** A split ingest batch. `release()` unpersists the ONE cache entry
    * both sides rest on — `clean.unpersist()`/`quarantine.unpersist()`
    * would not (they are derived frames, not the persisted plan), so
    * the raw handle is part of the contract, not an implementation
    * detail. Call it once both sides are materialized. */
  final case class SplitBatch(clean: DataFrame, quarantine: DataFrame,
      private val raw: DataFrame) {
    def release(): Unit = raw.unpersist(blocking = false)
  }

  /** PERMISSIVE JSONL read split into (clean, quarantine): clean rows
    * carry the declared schema; quarantine rows carry the raw
    * unparseable line + its source file. One scan feeds both sides —
    * the split is two filters over the same projection, and Catalyst
    * prunes each side's columns independently. The parsed frame is
    * persisted (MEMORY_AND_DISK); the caller MUST `release()` the
    * returned batch once both sides are materialized, or the cache
    * entry lives for the session. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType)
      : SplitBatch = {
    val raw = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .withColumn("__src_file", input_file_name())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = raw.filter(col(corruptCol).isNull)
      .drop(corruptCol, "__src_file")
    val quarantine = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw"), col("__src_file").as("src_file"))
    SplitBatch(clean, quarantine, raw)
  }

  /** Ingest with a quarantine sink: clean rows return MATERIALIZED
    * (localCheckpoint — the parse cache is released before returning,
    * so ingest leaks nothing), bad lines land as text under
    * quarantineDir (the badRecordsPath shape) so the job never drops
    * data and never dies on it. The sink is ALWAYS overwritten — a
    * re-run over a now-clean feed must not leave the previous run's
    * stale quarantine files for the re-drive to replay. Returns the
    * clean frame and the quarantined count. */
  def ingest(spark: SparkSession, path: String, schema: StructType,
      quarantineDir: String): (DataFrame, Long) = {
    val batch = readJsonl(spark, path, schema)
    try {
      val n = batch.quarantine.count()
      // Empty overwrite when n == 0 clears stale files from a prior
      // dirtier run of the same quarantineDir.
      batch.quarantine.select(col("raw"))
        .write.mode("overwrite").text(quarantineDir)
      val clean = batch.clean.localCheckpoint(eager = true)
      (clean, n)
    } finally batch.release()
  }
}
