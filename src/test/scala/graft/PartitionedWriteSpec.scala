package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 #81: incremental partitioned output. Dynamic partition
  * overwrite replaces ONLY the partitions present in the incoming
  * batch — the write-side contract that makes daily backfills safe at
  * 100 TB: re-running one day's pipeline must not truncate the other
  * 364 partitions (static overwrite mode would). */
class PartitionedWriteSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test

  test("dynamic partition overwrite touches only the incoming partitions") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-dpo").toString
    val old = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // Day 1 + day 2 land.
      Seq((1L, "2026-01-01", 10L), (2L, "2026-01-02", 20L))
        .toDF("id", "day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(out)
      // Re-run of day 2 only (corrected value): day 1 must survive.
      Seq((3L, "2026-01-02", 21L))
        .toDF("id", "day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(out)
      val rows = spark.read.parquet(out)
        .select($"day", $"id", $"v").as[(String, Long, Long)]
        .collect().toSet
      assert(rows == Set(("2026-01-01", 1L, 10L), ("2026-01-02", 3L, 21L)),
        s"day 1 untouched, day 2 replaced: $rows")
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
