package graft

import graft.sources.ShardedJournal
import graft.sources.ShardedJournal.ShardIterator
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kinesis-shaped sharded replay (kinesis_source.ex twin): shard
  * discovery, iterator types, get_records chaining, at-least-once
  * resume, and the tick-driven replay stream. */
class ShardedJournalSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  private lazy val journal = ShardedJournal.journal(spark, dir).cache()

  test("journal seqs are dense per shard and shards cover the key space") {
    import spark.implicits._
    val perShard = journal.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"seq").as("lo"), max($"seq").as("hi"),
        countDistinct($"seq").as("d"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(perShard.nonEmpty && perShard.length <= 4)
    perShard.foreach { case (shard, n, lo, hi, d) =>
      assert(lo == 1L && hi == n && d == n,
        s"shard $shard: seq must be dense 1..$n, got lo=$lo hi=$hi distinct=$d")
    }
    // one connection never straddles shards
    val split = journal.groupBy($"conn_id")
      .agg(countDistinct($"shard").as("s")).filter($"s" > 1).count()
    assert(split == 0, "a connection maps to exactly one shard")
  }

  test("trim-horizon get_records chains through the whole shard in order") {
    import spark.implicits._
    val shard = ShardedJournal.describeStream(journal).head
    val all = journal.filter($"shard" === shard).orderBy($"seq")
      .select($"seq").as[Long].collect().toSeq

    var it = ShardedJournal.trimHorizon(shard)
    val got = Seq.newBuilder[Long]
    var batches = 0
    var done = false
    while (!done) {
      val (slice, next) = ShardedJournal.getRecords(journal, it, limit = 7)
      val seqs = slice.select($"seq").as[Long].collect().toSeq
      assert(seqs.length <= 7, "limit bounds every batch")
      if (seqs.isEmpty) {
        assert(next == it, "empty read leaves the iterator unchanged")
        done = true
      } else {
        assert(seqs == seqs.sorted, "records arrive in seq order")
        got ++= seqs
        batches += 1
        it = next
      }
    }
    assert(got.result() == all,
      s"chained reads reproduce the shard exactly once ($batches batches)")
  }

  test("a failed delivery reuses the old iterator and refetches (at-least-once)") {
    import spark.implicits._
    val shard = ShardedJournal.describeStream(journal).head
    val it0 = ShardedJournal.trimHorizon(shard)
    val (s1, it1) = ShardedJournal.getRecords(journal, it0, limit = 5)
    val first = s1.select($"seq").as[Long].collect().toSeq
    // delivery "fails": don't advance — the same slice comes back
    val (s1again, _) = ShardedJournal.getRecords(journal, it0, limit = 5)
    assert(s1again.select($"seq").as[Long].collect().toSeq == first)
    // delivery succeeds: the chained iterator continues past it
    val (s2, _) = ShardedJournal.getRecords(journal, it1, limit = 5)
    val second = s2.select($"seq").as[Long].collect().toSeq
    assert(second.nonEmpty && second.head == first.last + 1,
      s"chain resumes after ${first.last}, got $second")
    // crash recovery: afterSequence rebuilds the same position from
    // a persisted token
    val resumed = ShardIterator.fromToken(it1.token)
    assert(resumed == ShardedJournal.afterSequence(shard, first.last))
  }

  test("LATEST starts past the end of a static journal") {
    import spark.implicits._
    val shard = ShardedJournal.describeStream(journal).head
    val it = ShardedJournal.latest(journal, shard)
    val (slice, next) = ShardedJournal.getRecords(journal, it, limit = 100)
    assert(slice.count() == 0 && next == it)
  }

  test("tick-driven replay stream releases per-shard slices in order") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val ticks = MemoryStream[Long]
    val stream = ShardedJournal.replayStream(spark, dir,
      msgsPerTick = 50, ticks = Some(ticks.toDF().toDF("tick")))
    val query = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("journal_replay")
      .start()
    try {
      ticks.addData(0L)
      query.processAllAvailable()
      val afterTick0 = spark.table("journal_replay").count()
      assert(afterTick0 > 0 && afterTick0 <= 4 * 50,
        s"tick 0 releases at most msgsPerTick per shard, got $afterTick0")
      ticks.addData(1L, 2L)
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("journal_replay")
    // every released packet is one EOT-terminated message whose seq is
    // within the ticked window
    val maxSeq = out.agg(max($"seq")).as[Long].first()
    assert(maxSeq <= 3 * 50, "no seq beyond the released ticks")
    assert(out.filter(!$"payload".endsWith(graft.streaming.OcsPipeline.EOT))
      .count() == 0, "payloads are EOT-terminated frames")
    // replay feeds the pipeline directly
    val frames = graft.streaming.OcsPipeline.frames(out.drop("seq"))
    assert(frames.count() == out.count(), "one frame per replayed record")
  }
}
