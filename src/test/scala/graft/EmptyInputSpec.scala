package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must run (and usually return 0 rows) on
  * EMPTY tables — a daily pipeline's first run, a filtered-to-nothing
  * partition, or a new tenant all look like this, and a crash on
  * empty input means a production incident instead of an empty
  * output directory. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val srcDir = "/root/testdata/sf0.001"

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query runs on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
