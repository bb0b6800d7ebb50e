package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 operator semantics: BPE merge application order and the
  * NN-Descent candidate-volume bound. */
class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  /** Tiny documents fixture with the given texts (other tables are
    * not read by the ops under test). */
  private def docsDir(texts: Seq[String]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-r15").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "fixture", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("text_bpe_encode applies merges in mined rank order") {
    // Corpus mined pairs: 'ab' ×4 ('abab' has 2, each trailing 'ab' 1)
    // vs 'ba' ×1 — rank order is [ab, ba]. Encoding "abab" with 'ab'
    // first merges BOTH occurrences left-to-right: (ab)(ab) → 2
    // tokens. The reverse order would first merge 'ba' into
    // (a)(ba)(b), destroying the second 'ab' adjacency → 3 tokens.
    // The token count therefore pins the application ORDER, not just
    // the merge set.
    val d = docsDir(Seq("abab", "ab", "ab"))
    val out = TextAnalysis.textBpeEncode(spark, d)
      .select(col("doc_id"), col("bpe_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 2L,
      s"'abab' must encode to 2 tokens under rank order (ab before ba), got ${out(0L)}")
    assert(out(1L) == 1L && out(2L) == 1L,
      "'ab' must collapse to a single merged token")
  }

  test("text_bpe_encode left-to-right non-overlap matches BPE ('aaa' -> [aa, a])") {
    val d = docsDir(Seq("aaa aaaa"))
    // pairs: 'aa' dominates; merging applies left-to-right without
    // overlap: aaa -> (aa)(a) = 2 tokens, aaaa -> (aa)(aa) = 2, plus
    // the single space token = 5 total for the doc.
    val out = TextAnalysis.textBpeEncode(spark, d).collect().head
    assert(out.getAs[Long]("bpe_tokens") == 5L,
      s"expected 5 tokens ('aa','a',' ','aa','aa'), got $out")
  }

  test("text_bpe_encode conserves mass: base_tokens = bpe_tokens + merges_applied") {
    val bad = TextAnalysis.textBpeEncode(spark, dir)
      .filter(col("base_tokens") =!= col("bpe_tokens") + col("merges_applied"))
      .count()
    assert(bad == 0L)
  }

  test("ann_nndescent: candidate edges stay linear in |V| and output is top-k shaped") {
    val v = Tables(spark, dir).embeddings.count()
    val out = Similarity.annNndescent(spark, dir)
    val n = out.count()
    // top-k output: at most k rows per node, rank within [1, k]
    assert(n <= v * 2, s"output $n rows exceeds |V|*k = ${v * 2}")
    val badRank = out.filter(col("rank") < 1 || col("rank") > 2).count()
    assert(badRank == 0L)
    // every node with any within-cell or bridge partner is covered
    assert(out.select(col("vec_id")).distinct().count() >= v - 1)
  }
}
