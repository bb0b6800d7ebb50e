package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout-aware scan parallelization (Tables.parallelized). A parquet
  * row group is Spark's atomic split unit, so a file written as ONE
  * giant row group pins every scan-stage expression to one task no
  * matter how many cores the session has (measured at sf10:
  * text_pii_redact 85 s wall / 90 s cpu on 32 cores). parallelized()
  * reads the footer and hash-repartitions by the table's primary key
  * ONLY when the layout starves the session — on a healthy many-group
  * layout (the 100 TB case) it must stay a plain scan with no
  * exchange.
  */
class ScanParallelSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test

  /** Write `n` docs as a SINGLE parquet file (one row group) named
    * documents.parquet under a fresh dir, the shape Tables expects. */
  private def writeDocs(n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scanpar")
    val stage = dir.resolve("stage").toString
    spark.range(n.toLong).toDF("doc_id")
      .select(col("doc_id"), concat(lit("text-"), col("doc_id")).as("text"),
        lit("en").as("lang"), lit("web").as("source"),
        length(concat(lit("text-"), col("doc_id"))).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part, dir.resolve("documents.parquet"))
    dir.toString
  }

  test("a starved single-row-group layout is widened to the session's cores") {
    val dir = writeDocs(60000) // >= 50k rows/group, 1 group < cores/2
    val t = Tables(spark, dir)
    assert(t.documents.rdd.getNumPartitions === 1,
      "precondition: the raw scan of one row group is one task")
    val widened = t.parallelized("documents")
    assert(widened.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // Same rows, only redistributed.
    assert(widened.count() === 60000L)
    assert(widened.agg(sum(col("doc_id"))).head.getLong(0) ===
      59999L * 60000L / 2)
  }

  test("a small table stays a plain scan — no exchange added") {
    val dir = writeDocs(1000) // below the 50k rows/group threshold
    val t = Tables(spark, dir)
    val df = t.parallelized("documents")
    assert(df.queryExecution.executedPlan.toString.indexOf("Exchange") < 0,
      "below the starvation threshold parallelized() must not shuffle")
  }

  test("an unreadable footer (directory-of-parts layout) degrades to the plain scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scanpar-dir")
    spark.range(60000L).toDF("doc_id")
      .select(col("doc_id"), lit("t").as("text"), lit("en").as("lang"),
        lit("web").as("source"), lit(1L).as("n_chars"))
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val df = Tables(spark, dir.toString).parallelized("documents")
    assert(df.count() === 60000L) // healthy-by-assumption: no crash, no widen
  }
}
