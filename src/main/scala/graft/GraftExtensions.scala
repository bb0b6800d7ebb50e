package graft

import graft.functions.{AmsSigns, Bigrams, BpeTokenCount, CmsPositions, DotProduct, LshBuckets, NTokens, NearestCells, NearestCellsMilli, PoissonWeights, PolyHash, RakePhrases, SpanHashes, Spans, Tokens, WinnowMins}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions: registers graft's native expressions so every
  * surface (DataFrame code via call_function, spark.sql, spark-shell
  * with spark.sql.extensions=graft.GraftExtensions) sees them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.register(ext)
}

object GraftExtensions {
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_dot expects exactly 2 arguments (array<double>, array<double>), got ${children.length}")
        DotProduct(children(0), children(1))
      }))
    // (v, cellsLit, centMatLit, keepLit, twoLevelMinLit): keep and
    // twoLevelMin are consumed at build time from foldable int args.
    def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval(null) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long => l.intValue
        case x => throw new IllegalArgumentException(
          s"expected a foldable int argument, got $x")
      }
    ext.injectFunction((
      new FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 5,
          s"graft_nearest_cells expects 5 arguments, got ${children.length}")
        NearestCells(children(0), children(1), children(2),
          intArg(children(3)), intArg(children(4)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 4,
          s"graft_lsh_buckets expects 4 arguments, got ${children.length}")
        LshBuckets(children(0), children(1),
          intArg(children(2)), intArg(children(3)))
      }))
    def strArg(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
      e.eval(null) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case x => throw new IllegalArgumentException(
          s"expected a foldable string argument, got $x")
      }
    def boolIntArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      intArg(e) != 0
    // Text/dedup hot-path kernels (round 17 — see TextKernels.scala).
    // Static shape args (widths, flags, prefixes) are consumed at
    // registration from foldable literals, like graft_lsh_buckets.
    def inject1(name: String, cls: Class[_],
        mk: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression,
        arity: Int): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(children.length == arity,
            s"$name expects $arity arguments, got ${children.length}")
          mk(children)
        }))
    inject1("graft_tokens", classOf[Tokens], c => Tokens(c(0)), 1)
    inject1("graft_ntokens", classOf[NTokens],
      c => NTokens(c(0), boolIntArg(c(1))), 2)
    inject1("graft_spans", classOf[Spans],
      c => Spans(c(0), intArg(c(1)), boolIntArg(c(2)), boolIntArg(c(3))), 4)
    inject1("graft_span_hashes", classOf[SpanHashes],
      c => SpanHashes(c(0), strArg(c(1)), intArg(c(2)), intArg(c(3))), 4)
    inject1("graft_winnow_mins", classOf[WinnowMins],
      c => WinnowMins(c(0), intArg(c(1)), intArg(c(2))), 3)
    inject1("graft_bigrams", classOf[Bigrams], c => Bigrams(c(0)), 1)
    inject1("graft_poly_hash", classOf[PolyHash], c => PolyHash(c(0)), 1)
    inject1("graft_bpe_token_count", classOf[BpeTokenCount],
      c => BpeTokenCount(c(0), c(1)), 2)
    inject1("graft_rake_phrases", classOf[RakePhrases],
      c => RakePhrases(c(0), c(1)), 2)
    inject1("graft_ams_signs", classOf[AmsSigns],
      c => AmsSigns(c(0), intArg(c(1))), 2)
    inject1("graft_boot_weights", classOf[PoissonWeights],
      c => PoissonWeights(c(0), c(1), intArg(c(2))), 3)
    inject1("graft_cms_positions", classOf[CmsPositions],
      c => CmsPositions(c(0), intArg(c(1)), intArg(c(2))), 3)
    ext.injectFunction((
      new FunctionIdentifier("graft_nearest_cells_milli"),
      new ExpressionInfo(classOf[NearestCellsMilli].getName,
        "graft_nearest_cells_milli"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 5,
          s"graft_nearest_cells_milli expects 5 arguments, got ${children.length}")
        NearestCellsMilli(children(0), children(1), children(2),
          intArg(children(3)), intArg(children(4)))
      }))
  }
}
