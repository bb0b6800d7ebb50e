package graft

import graft.functions.{DotProduct, LshBuckets, NearestCells, NearestCellsMilli}
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
