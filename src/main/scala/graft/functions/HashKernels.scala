package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the md5-derived sketch/sampling hot paths
  * (round 17, guide §4): sketch_ams, sample_bootstrap and sketch_cms
  * each derived per-row values from md5 THROUGH THE HEX STRING —
  * `conv(substring(md5(concat(…)), i, n), 16, 10)` — and multiplied
  * the rows first (explode ×32 / ×32 / ×4) so every cell paid its own
  * string build, hex render, substring and string-to-long parse.
  * These kernels compute the whole per-row vector in one pass from
  * the raw digest bytes; the md5 calls themselves are preserved
  * bit-for-bit (same salted input byte streams), so the DuckDB twins
  * replay unchanged. Parity pinned in TextKernelsSpec. */
private[graft] object HashKernel {
  /** Decimal digits of i (0 ≤ i < 100) appended to the digest. */
  def updateInt(md: java.security.MessageDigest, i: Int): Unit = {
    if (i >= 10) md.update(('0' + i / 10).toByte)
    md.update(('0' + i % 10).toByte)
  }
}

/** graft_ams_signs(str, s): the S tug-of-war signs of one key — sign
  * i is the parity of hex nibble i of md5(str), mapped to ±1. Exactly
  * `conv(substring(md5(str), i+1, 1), 16, 10) % 2 * 2 - 1` for
  * i = 0…s−1, without the explode or the per-nibble substring/conv.
  * Long elements so downstream sums keep their old types. */
case class AmsSigns(child: Expression, s: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && s >= 1 && s <= 32)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_ams_signs expects (string, 1 ≤ s ≤ 32)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ams_signs"

  protected override def nullSafeEval(input: Any): Any =
    AmsSigns.signs(input.asInstanceOf[UTF8String], s)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AmsSigns.signs($c, $s)")
  override protected def withNewChildInternal(newChild: Expression): AmsSigns =
    copy(child = newChild)
}

object AmsSigns {
  def signs(str: UTF8String, s: Int): ArrayData = {
    val md = TextKernel.md5.get()
    md.reset()
    md.update(str.getBytes)
    val d = md.digest()
    val out = new Array[Long](s)
    var i = 0
    while (i < s) {
      val by = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) by >>> 4 else by & 0xf
      out(i) = (nib & 1) * 2L - 1L
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_boot_weights(idStr, cdf, b): the b Poisson bootstrap weights
  * of one row. For replicate i in 0…b−1, draw h = first 15 hex digits
  * of md5("boot:" || i || ":" || idStr) as a 60-bit uniform and map
  * through the inverse CDF:
  * w = first k with h < cdf(k), else |cdf|. Replaces sample_bootstrap's
  * ×B explode + per-draw concat/md5-hex/substring/conv + CASE chain.
  * cdf must be a foldable ascending array<long>. */
case class PoissonWeights(left: Expression, right: Expression, b: Int)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // b ≤ 99: the salt renderer (HashKernel.updateInt) emits at most
    // two DECIMAL digits; b = 100+ would feed garbled salt bytes
    // (':' for digit 10) into md5 and silently diverge from the
    // documented md5('boot:i:id') contract and the DuckDB twin.
    case (StringType, ArrayType(LongType, _)) if right.foldable && b >= 1 && b <= 99 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_boot_weights expects (string, foldable array<long>, 1 ≤ b ≤ 99)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_boot_weights"

  @transient private lazy val model: PoissonModel = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    new PoissonModel(arr.toLongArray(), b)
  }

  protected override def nullSafeEval(id: Any, cdf: Any): Any =
    model.weights(id.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("poissonModel", model, classOf[PoissonModel].getName)
    defineCodeGen(ctx, ev, (id, _) => s"$mref.weights($id)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PoissonWeights =
    copy(left = newLeft, right = newRight)
}

private[graft] final class PoissonModel(cdf: Array[Long], b: Int) extends Serializable {
  private val prefix = "boot:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  def weights(id: UTF8String): ArrayData = {
    val idb = id.getBytes
    val md = TextKernel.md5.get()
    val out = new Array[Long](b)
    var i = 0
    while (i < b) {
      md.reset()
      md.update(prefix)
      HashKernel.updateInt(md, i)
      md.update(':'.toByte)
      md.update(idb)
      val h = TextKernel.hexPrefixValue(md.digest(), 15)
      var w = 0
      while (w < cdf.length && h >= cdf(w)) w += 1
      out(i) = w.toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_cms_positions(keyStr, depth, width): the count-min row
  * positions of one key — position j (1-based row) is the first 15
  * hex digits of md5("cms" || j || ":" || keyStr) mod width, exactly
  * sketch_cms's cmsPos(j, key) for j = 1…depth without the ×depth
  * struct explode's per-cell md5-hex/conv. */
case class CmsPositions(child: Expression, depth: Int, width: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && depth >= 1 && depth <= 16 && width >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_cms_positions expects (string, 1 ≤ depth ≤ 16, width ≥ 1)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms_positions"

  protected override def nullSafeEval(input: Any): Any =
    CmsPositions.positions(input.asInstanceOf[UTF8String], depth, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CmsPositions.positions($c, $depth, $width)")
  override protected def withNewChildInternal(newChild: Expression): CmsPositions =
    copy(child = newChild)
}

object CmsPositions {
  private val prefix = "cms".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  def positions(key: UTF8String, depth: Int, width: Int): ArrayData = {
    val kb = key.getBytes
    val md = TextKernel.md5.get()
    val out = new Array[Long](depth)
    var j = 1
    while (j <= depth) {
      md.reset()
      md.update(prefix)
      HashKernel.updateInt(md, j)
      md.update(':'.toByte)
      md.update(kb)
      out(j - 1) = TextKernel.hexPrefixValue(md.digest(), 15) % width
      j += 1
    }
    new GenericArrayData(out)
  }
}
