package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The production state-store configuration: at 100 TB the default
  * HDFS-backed in-memory state store caps state at executor heap;
  * RocksDB spills to local disk with changelog checkpointing and is
  * the deployment default for large stateful pipelines. This proves
  * the pipeline's stateful operators run unmodified on the RocksDB
  * provider — configuration, not code, selects it. */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test

  test("streaming dedup runs on the RocksDB state store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[Int]
      val q = in.toDS().toDF("id").dropDuplicates("id")
        .writeStream.outputMode("append")
        .format("memory").queryName("rocks_dedup").start()
      try {
        in.addData(1, 2, 3, 2, 1)
        q.processAllAvailable()
        in.addData(3, 4, 1)
        q.processAllAvailable()
        assert(spark.table("rocks_dedup").count() == 4) // 1,2,3,4 once each
        // The state operator actually ran on RocksDB: its progress
        // carries rocksdb* custom metrics (absent on the default
        // HDFS-backed provider).
        val metrics = q.lastProgress.stateOperators.toSeq
          .flatMap(_.customMetrics.keySet.asScala)
        assert(metrics.exists(_.startsWith("rocksdb")),
          s"expected rocksdb metrics, got: $metrics")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
