package graft.sources

import graft.Tables
import graft.streaming.RawPacket
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A Kinesis-shaped sharded, sequence-numbered replay source — the
  * graft twin of the reference's `mix kinesis_source`
  * (lib/mix/tasks/kinesis_source.ex:1-60 and its ShardToPort loop):
  * describe the stream's shards, open a per-shard iterator
  * (TRIM_HORIZON / LATEST / resume-after-sequence), then chain
  * `get_records` calls through the returned next-iterator — and on a
  * delivery failure do NOT advance, so the same records re-fetch
  * (at-least-once, kinesis_source.ex "don't update the shard
  * iterator").
  *
  * The stream itself is modelled as a deterministic JOURNAL over the
  * `events` table: shard = portable md5 hash of the connection key,
  * seq = dense per-shard arrival order. Everything stays declarative:
  *
  *  - the journal is one window over (shard) — a single shuffle, and
  *    at 100 TB the journal would be written once, partitioned by
  *    shard, so the row_number is a per-partition scan;
  *  - `getRecords` is a seq-range filter on (shard, seq) — with a
  *    shard-partitioned journal that's partition pruning plus a
  *    pushed range predicate, never a scan of other shards;
  *  - iterator state is two longs (control plane), never data on the
  *    driver.
  */
object ShardedJournal {

  private val EOT = graft.streaming.OcsPipeline.EOT

  /** Opaque-ish shard iterator, Kinesis style: a resumable position
    * strictly AFTER `afterSeq` in one shard. */
  final case class ShardIterator(shard: Long, afterSeq: Long) {
    def token: String = s"$shard:$afterSeq"
  }
  object ShardIterator {
    def fromToken(t: String): ShardIterator = {
      val Array(s, a) = t.split(":", 2)
      ShardIterator(s.toLong, a.toLong)
    }
  }

  /** Portable shard assignment — md5-derived so the DuckDB oracle
    * replays it bit-identically (same trick as Dedup's h31). */
  private def shardOf(c: org.apache.spark.sql.Column, nShards: Int) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % nShards

  /** The sharded journal: (shard, seq, conn_id, source_ip, receive_ts,
    * message) with seq dense per shard in (receive_ts, event_id)
    * arrival order. Message construction matches PacketSources.replay
    * (HEARTBEAT every 7th event). */
  def journal(spark: SparkSession, dir: String, nShards: Int = 4): DataFrame = {
    val base = Tables(spark, dir).events
      .select(
        concat(lit("conn-"), col("user_id")).as("conn_id"),
        concat(lit("10.0.0."), pmod(col("user_id"), lit(250))).as("source_ip"),
        col("ts").as("receive_ts"),
        when(col("event_id") % 7 === 0, lit("HEARTBEAT"))
          .otherwise(concat(col("event_type"), lit(","), col("event_id"))).as("message"),
        col("event_id"))
      .withColumn("shard", shardOf(col("conn_id"), nShards))
    base
      .withColumn("seq", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("receive_ts"), col("event_id"))).cast("long"))
      .select(col("shard"), col("seq"), col("conn_id"), col("source_ip"),
        col("receive_ts"), col("message"))
  }

  /** Oracle-facing variant: deterministic total order. */
  def shardJournal(spark: SparkSession, dir: String): DataFrame =
    journal(spark, dir).orderBy(col("shard"), col("seq"))

  def shardJournalSql(nShards: Int = 4): String =
    s"""WITH base AS (
       |  SELECT
       |    (CAST(('0x' || substr(md5('conn-' || user_id), 1, 8)) AS BIGINT)
       |      % $nShards) AS shard,
       |    'conn-' || user_id AS conn_id,
       |    '10.0.0.' || (user_id % 250) AS source_ip,
       |    ts AS receive_ts,
       |    CASE WHEN event_id % 7 = 0 THEN 'HEARTBEAT'
       |         ELSE event_type || ',' || event_id END AS message,
       |    event_id
       |  FROM events)
       |SELECT shard,
       |  CAST(row_number() OVER (
       |    PARTITION BY shard ORDER BY receive_ts, event_id) AS BIGINT) AS seq,
       |  conn_id, source_ip, receive_ts, message
       |FROM base ORDER BY shard, seq""".stripMargin

  /** describe_stream: the shard ids present (control plane — one tiny
    * distinct over the shard column). */
  def describeStream(journal: DataFrame): Seq[Long] =
    journal.select(col("shard")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq

  /** get_shard_iterator(TRIM_HORIZON): replay the shard from the top. */
  def trimHorizon(shard: Long): ShardIterator = ShardIterator(shard, 0L)

  /** get_shard_iterator(LATEST): only records past the current end —
    * for a static journal, nothing. One max(seq) agg (control plane). */
  def latest(journal: DataFrame, shard: Long): ShardIterator = {
    val end = journal.filter(col("shard") === shard)
      .agg(max(col("seq"))).first()
    ShardIterator(shard, if (end.isNullAt(0)) 0L else end.getLong(0))
  }

  /** get_shard_iterator(AFTER_SEQUENCE_NUMBER): resume a chain after
    * the last delivered sequence — the crash-recovery entry point. */
  def afterSequence(shard: Long, seq: Long): ShardIterator =
    ShardIterator(shard, seq)

  /** get_records: up to `limit` records strictly after the iterator,
    * in seq order, plus the chained next-iterator. An empty read
    * returns the iterator unchanged; a caller whose delivery fails
    * simply reuses the OLD iterator and re-fetches (at-least-once,
    * exactly kinesis_source.ex's send-error branch). The record frame
    * is a (shard, seq-range) filter — partition-prunable at scale; the
    * one driver-side value is max(seq) of the slice. */
  def getRecords(journal: DataFrame, it: ShardIterator,
    limit: Int): (DataFrame, ShardIterator) = {
    val slice = journal
      .filter(col("shard") === it.shard &&
        col("seq") > it.afterSeq && col("seq") <= it.afterSeq + limit)
      .orderBy(col("seq"))
    val last = slice.agg(max(col("seq"))).first()
    val next = if (last.isNullAt(0)) it else it.copy(afterSeq = last.getLong(0))
    (slice, next)
  }

  /** The journal as a live replay stream: each tick of the driving
    * stream releases the next `msgsPerTick` records OF EVERY SHARD
    * (the reference runs one ShardToPort loop per shard on a shared
    * interval), shaped as RawPacket for the OCS pipeline. Ticks
    * default to the rate source (one tick/second); specs inject a
    * MemoryStream of tick numbers for determinism. */
  def replayStream(spark: SparkSession, dir: String, nShards: Int = 4,
    msgsPerTick: Int = 100, ticks: Option[DataFrame] = None): Dataset[RawPacket] = {
    import spark.implicits._
    val t = ticks.getOrElse(
      spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(col("value").as("tick")))
    val j = journal(spark, dir, nShards)
      .withColumn("tick", ((col("seq") - 1) / msgsPerTick).cast("long"))
    t.join(j, Seq("tick")) // stream-static equijoin; static side prunable by tick
      .select(col("conn_id").as("connId"), col("source_ip").as("sourceIp"),
        col("receive_ts").as("receiveTs"),
        concat(col("message"), lit(EOT)).as("payload"),
        col("seq"))
      .as[RawPacket]
  }
}
