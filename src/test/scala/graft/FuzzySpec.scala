package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 #68: neighborhood-blocked edit-distance join. */
class FuzzySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("fuzzy join never plans a cartesian product or nested loop") {
    val p = Fuzzy.fuzzyJoin(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "edit-distance join must block into equijoins")
  }

  test("fuzzy join equals the quadratic levenshtein join") {
    import spark.implicits._
    val names = Tables(spark, dir).customer
      .select($"c_custkey", $"c_name").as[(Long, String)].collect()
    val expect = (for {
      (ka, na) <- names; (kb, nb) <- names if ka < kb
      d = levRef(na, nb) if d <= 1
    } yield (ka, kb, d.toLong)).toSet
    val got = Fuzzy.fuzzyJoin(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect, s"got ${got.size} pairs, expect ${expect.size}")
  }

  /** Plain DP Levenshtein reference. */
  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
