package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All nTables hyperplane-LSH bucket ids of one vector, as a native
  * codegen expression.
  *
  * THE HOT-PATH FIX (round 17, guide §4 "eliminate non-codegen
  * expressions"): the old bucket derivation was
  * `transform(planesLit, p -> when(graft_dot(v, p) > 0, 1).otherwise(0))`
  * — a higher-order function, which Spark evaluates INTERPRETED: the
  * nTables·bits dot products per row each pay lambda dispatch and
  * boxed eval instead of the JIT loop graft_dot's doGenCode provides
  * at top level. Measured at sf0.1: one evaluation of the bucket
  * pipeline costs ~0.5–1 s for 2 000 rows × 84 planes, and the salted
  * self-join consumers evaluate it up to 4× per query (both join
  * sides × the hot-bucket digest), which is where the dedup/ann
  * family's ×5–20 CPU regression lived. This expression computes all
  * nTables bucket ids in one JIT-compiled primitive loop — same
  * 100 TB argument as NearestCells: the per-row scan cost is the term
  * that scales with the corpus.
  *
  * Bit-exact contract with the old expression chain (and therefore
  * with the DuckDB twin, which replays the same planes as SQL
  * literals): dots fold in ascending index order; a bit is set iff
  * dot > 0 (strict, NaN-false); bucket = Σ bit_k · 2^(bits−1−k); a
  * NULL or wrong-dimension vector yields bucket 0 in EVERY table —
  * exactly what `when(null > 0, 1).otherwise(0)` produced — so the
  * expression itself is never null and malformed rows keep colliding
  * into bucket 0, as before.
  */
private[graft] final class LshBucketModel(
    val planes: Array[Double], val nTables: Int, val bits: Int)
  extends Serializable {

  val dim: Int =
    if (nTables * bits == 0) 0 else planes.length / (nTables * bits)

  def buckets(vd: ArrayData): ArrayData = {
    val out = new Array[Int](nTables)
    if (vd != null && vd.numElements() == dim && dim > 0) {
      val v = vd.toDoubleArray()
      var t = 0
      while (t < nTables) {
        var b = 0
        var k = 0
        while (k < bits) {
          val off = (t * bits + k) * dim
          var s = 0.0
          var i = 0
          while (i < dim) { s += v(i) * planes(off + i); i += 1 }
          if (s > 0) b += 1 << (bits - 1 - k)
          k += 1
        }
        out(t) = b
        t += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** graft_lsh_buckets(v, planesFlat, nTables, bits): array<int> of the
  * vector's bucket id in each of the nTables hash tables. planesFlat
  * is a foldable array<double> literal of nTables·bits·dim plane
  * coordinates (plane p occupies [p·dim, (p+1)·dim)); nTables/bits are
  * int literals consumed at registration. */
case class LshBuckets(left: Expression, right: Expression,
    nTables: Int, bits: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(e: Expression): DataType = e.dataType match {
      case ArrayType(t, _) => t
      case t => t
    }
    val ok = elem(left) == DoubleType && elem(right) == DoubleType &&
      right.foldable && nTables >= 1 && bits >= 1
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_lsh_buckets expects (array<double>, foldable array<double>, " +
        "nTables ≥ 1, bits ≥ 1)")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val model: LshBucketModel = {
    val ps = right.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    new LshBucketModel(ps, nTables, bits)
  }

  // Not nullSafeEval: a null vector must yield all-zero buckets (the
  // old when(null > 0).otherwise(0) semantics), never a null array.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    model.buckets(left.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val mref = ctx.addReferenceObj("lshModel", model,
      classOf[LshBucketModel].getName)
    val childGen = left.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $mref.buckets(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBuckets =
    copy(left = newLeft, right = newRight)
}
