package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Two-level IVF coarse-quantizer assignment as a native expression.
  *
  * THE SCALE FIX (round-17): the old assignment materialized an n·k
  * row cross-join (corpus × broadcast centroids) and ranked it with a
  * row_number window — a full sort shuffle of n·k 500-byte rows. With
  * k = ⌈√n/2⌉ that is n^1.5 rows end to end, measured ×12–24 at the
  * sf10 decade across the 7-query IVF family. This expression computes
  * the same top-`keep` cells per row in a single projection: zero
  * extra rows, zero shuffle, one JIT-compiled primitive loop. The
  * model (cell ids + flattened centroid matrix) rides the plan as
  * array literals — task binaries are broadcast once per stage, so the
  * O(√n) model ships exactly like a broadcast variable.
  *
  * Two-level structure: when k ≥ `twoLevelMin` the model picks
  * k1 = ⌈√k⌉ representative cells (the first k1 centroids ranked by
  * (md5(cell), cell) — the same engine-agnostic sampling trick as the
  * centroids themselves), assigns every centroid to its nearest
  * representative, and a vector then probes its `groupProbes`=2
  * nearest representatives and ranks only those groups' centroids —
  * per-row work O(√k·d) instead of O(k·d), so assignment cost is
  * n·n^(1/4) instead of n·√n. Below `twoLevelMin` the model
  * degenerates to ONE group holding every centroid, which is exactly
  * the exhaustive single-level scan — so small corpora (every test SF
  * ≤ 0.1) keep bit-identical results and the approximation only
  * engages where the n^1.5 cost did. The DuckDB twins replay the same
  * two levels (reps/cgrp/vp CTEs in Similarity.ivfAdCtes) with the
  * same (d2, cell) total order, so results stay hash-identical
  * cross-engine at every SF.
  *
  * Distances fold in ascending index order ((v_i − c_i)² summed left
  * to right), matching both the old zip_with/aggregate plan and the
  * oracle's list_reduce — bit-exact across all three.
  */
private[graft] final class IvfCellModel(
    val cells: Array[Long], val mat: Array[Double], val twoLevelMin: Int)
  extends Serializable {

  val k: Int = cells.length
  val dim: Int = if (k == 0) 0 else mat.length / k
  /** Representative count: smallest m with m·m ≥ k (integer-exact so
    * the SQL twin's range() formula picks the identical value). */
  val k1: Int = if (k >= twoLevelMin) IvfCellModel.intSqrt(k) else 1

  /** Centroid indices of the k1 representatives, in (md5(cell), cell)
    * order — the deterministic sample order both engines replay. */
  private val repIdx: Array[Int] =
    (0 until k).sortBy(i => (IvfCellModel.md5hex(cells(i).toString), cells(i)))
      .take(k1).toArray

  /** Member centroid indices per representative slot (nearest rep by
    * (d2, repCell) — ties on the rep's cell id, like the SQL twin). */
  private val members: Array[Array[Int]] =
    if (k1 <= 1) Array(Array.range(0, k))
    else {
      val groups = Array.fill(k1)(new scala.collection.mutable.ArrayBuffer[Int])
      var i = 0
      while (i < k) {
        var best = 0
        var bestD = d2Between(i, repIdx(0))
        var r = 1
        while (r < k1) {
          val d = d2Between(i, repIdx(r))
          if (d < bestD || (d == bestD && cells(repIdx(r)) < cells(repIdx(best)))) {
            best = r; bestD = d
          }
          r += 1
        }
        groups(best) += i
        i += 1
      }
      groups.map(_.toArray)
    }

  private def d2Between(i: Int, j: Int): Double = {
    var s = 0.0
    var x = 0
    while (x < dim) {
      val d = mat(i * dim + x) - mat(j * dim + x)
      s += d * d
      x += 1
    }
    s
  }

  private def d2To(i: Int, v: Array[Double]): Double = {
    val off = i * dim
    var s = 0.0
    var x = 0
    while (x < dim) { val d = v(x) - mat(off + x); s += d * d; x += 1 }
    s
  }

  /** Top-`keep` cells for `vd` by (d2, cell) — null on a malformed
    * (wrong-dim) vector, empty array on an empty model. */
  def nearest(vd: ArrayData, keep: Int): ArrayData = {
    if (k == 0) return new GenericArrayData(Array.emptyLongArray)
    if (vd.numElements() != dim) return null
    val v = vd.toDoubleArray()
    val kd = new Array[Double](keep)
    val kc = new Array[Long](keep)
    var m = 0
    def offer(d2: Double, cell: Long): Unit = {
      if (m < keep || d2 < kd(m - 1) || (d2 == kd(m - 1) && cell < kc(m - 1))) {
        var p = if (m < keep) m else keep - 1
        while (p > 0 && (d2 < kd(p - 1) || (d2 == kd(p - 1) && cell < kc(p - 1)))) {
          kd(p) = kd(p - 1); kc(p) = kc(p - 1); p -= 1
        }
        kd(p) = d2; kc(p) = cell
        if (m < keep) m += 1
      }
    }
    if (k1 <= 1) {
      var i = 0
      while (i < k) { offer(d2To(i, v), cells(i)); i += 1 }
    } else {
      // two nearest representatives by (d2, repCell)
      var r0 = -1; var r1 = -1
      var d0 = Double.MaxValue; var d1 = Double.MaxValue
      var r = 0
      while (r < k1) {
        val d = d2To(repIdx(r), v)
        val c = cells(repIdx(r))
        val beats0 = r0 < 0 || d < d0 || (d == d0 && c < cells(repIdx(r0)))
        if (beats0) { r1 = r0; d1 = d0; r0 = r; d0 = d }
        else if (r1 < 0 || d < d1 || (d == d1 && c < cells(repIdx(r1)))) {
          r1 = r; d1 = d
        }
        r += 1
      }
      var g = 0
      while (g < 2) {
        val slot = if (g == 0) r0 else r1
        if (slot >= 0) {
          val ms = members(slot)
          var i = 0
          while (i < ms.length) { offer(d2To(ms(i), v), cells(ms(i))); i += 1 }
        }
        g += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(kc, m))
  }
}

/** Integer-milli twin of IvfCellModel for ann_kmeans_step's quantized
  * domain: identical structure, Long distances (order-independent
  * integer sums, the k-means float-determinism discipline). */
private[graft] final class IvfCellModelL(
    val cells: Array[Long], val mat: Array[Long], val twoLevelMin: Int)
  extends Serializable {

  val k: Int = cells.length
  val dim: Int = if (k == 0) 0 else mat.length / k
  val k1: Int = if (k >= twoLevelMin) IvfCellModel.intSqrt(k) else 1

  private val repIdx: Array[Int] =
    (0 until k).sortBy(i => (IvfCellModel.md5hex(cells(i).toString), cells(i)))
      .take(k1).toArray

  private val members: Array[Array[Int]] =
    if (k1 <= 1) Array(Array.range(0, k))
    else {
      val groups = Array.fill(k1)(new scala.collection.mutable.ArrayBuffer[Int])
      var i = 0
      while (i < k) {
        var best = 0
        var bestD = d2Between(i, repIdx(0))
        var r = 1
        while (r < k1) {
          val d = d2Between(i, repIdx(r))
          if (d < bestD || (d == bestD && cells(repIdx(r)) < cells(repIdx(best)))) {
            best = r; bestD = d
          }
          r += 1
        }
        groups(best) += i
        i += 1
      }
      groups.map(_.toArray)
    }

  private def d2Between(i: Int, j: Int): Long = {
    var s = 0L
    var x = 0
    while (x < dim) {
      val d = mat(i * dim + x) - mat(j * dim + x)
      s += d * d
      x += 1
    }
    s
  }

  private def d2To(i: Int, v: Array[Long]): Long = {
    val off = i * dim
    var s = 0L
    var x = 0
    while (x < dim) { val d = v(x) - mat(off + x); s += d * d; x += 1 }
    s
  }

  def nearest(vd: ArrayData, keep: Int): ArrayData = {
    if (k == 0) return new GenericArrayData(Array.emptyLongArray)
    if (vd.numElements() != dim) return null
    val v = vd.toLongArray()
    val kd = new Array[Long](keep)
    val kc = new Array[Long](keep)
    var m = 0
    def offer(d2: Long, cell: Long): Unit = {
      if (m < keep || d2 < kd(m - 1) || (d2 == kd(m - 1) && cell < kc(m - 1))) {
        var p = if (m < keep) m else keep - 1
        while (p > 0 && (d2 < kd(p - 1) || (d2 == kd(p - 1) && cell < kc(p - 1)))) {
          kd(p) = kd(p - 1); kc(p) = kc(p - 1); p -= 1
        }
        kd(p) = d2; kc(p) = cell
        if (m < keep) m += 1
      }
    }
    if (k1 <= 1) {
      var i = 0
      while (i < k) { offer(d2To(i, v), cells(i)); i += 1 }
    } else {
      var r0 = -1; var r1 = -1
      var d0 = Long.MaxValue; var d1 = Long.MaxValue
      var r = 0
      while (r < k1) {
        val d = d2To(repIdx(r), v)
        val c = cells(repIdx(r))
        val beats0 = r0 < 0 || d < d0 || (d == d0 && c < cells(repIdx(r0)))
        if (beats0) { r1 = r0; d1 = d0; r0 = r; d0 = d }
        else if (r1 < 0 || d < d1 || (d == d1 && c < cells(repIdx(r1)))) {
          r1 = r; d1 = d
        }
        r += 1
      }
      var g = 0
      while (g < 2) {
        val slot = if (g == 0) r0 else r1
        if (slot >= 0) {
          val ms = members(slot)
          var i = 0
          while (i < ms.length) { offer(d2To(ms(i), v), cells(ms(i))); i += 1 }
        }
        g += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(kc, m))
  }
}

private[graft] object IvfCellModel {
  /** Smallest m ≥ 1 with m·m ≥ k — the integer sqrt both engines
    * compute identically (SQL: min(m) FROM range(1, …) WHERE m*m ≥ k). */
  def intSqrt(k: Int): Int = {
    var m = math.max(1, math.sqrt(k.toDouble).toInt - 1)
    while (m * m < k) m += 1
    m
  }

  def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}

/** graft_nearest_cells(v, cells, centMat, keep, twoLevelMin): the
  * top-`keep` IVF cells for vector `v`, in (d2, cell) rank order.
  * `cells`/`centMat` are foldable array literals (the driver-collected
  * O(√n) model); keep/twoLevelMin are int literals consumed at
  * registration. Generated code is one call into the JIT-compiled
  * model loop — the projection stays inside WholeStageCodegen. */
case class NearestCells(first: Expression, second: Expression,
    third: Expression, keep: Int, twoLevelMin: Int)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(e: Expression): DataType = e.dataType match {
      case ArrayType(t, _) => t
      case t => t
    }
    val ok = elem(first) == DoubleType && elem(second) == LongType &&
      elem(third) == DoubleType && second.foldable && third.foldable && keep >= 1
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_nearest_cells expects (array<double>, foldable array<bigint>, " +
        "foldable array<double>, keep ≥ 1)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cells"

  @transient private lazy val model: IvfCellModel = {
    val cs = second.eval(null).asInstanceOf[ArrayData].toLongArray()
    val mt = third.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    new IvfCellModel(cs, mt, twoLevelMin)
  }

  override protected def nullSafeEval(v: Any, c: Any, m: Any): Any =
    model.nearest(v.asInstanceOf[ArrayData], keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val mref = ctx.addReferenceObj("ivfModel", model,
        classOf[IvfCellModel].getName)
      val r = ctx.freshName("cellsOut")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  $mref.nearest($v, $keep);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NearestCells =
    copy(first = f, second = s, third = t)
}

/** graft_nearest_cells_milli: the same assignment in the integer-milli
  * domain (array<bigint> vector and centroid matrix, Long distances)
  * for ann_kmeans_step. */
case class NearestCellsMilli(first: Expression, second: Expression,
    third: Expression, keep: Int, twoLevelMin: Int)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(e: Expression): DataType = e.dataType match {
      case ArrayType(t, _) => t
      case t => t
    }
    val ok = elem(first) == LongType && elem(second) == LongType &&
      elem(third) == LongType &&
      second.foldable && third.foldable && keep >= 1
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_nearest_cells_milli expects (array<bigint>, foldable " +
        "array<bigint>, foldable array<bigint>, keep ≥ 1)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cells_milli"

  @transient private lazy val model: IvfCellModelL = {
    val cs = second.eval(null).asInstanceOf[ArrayData].toLongArray()
    val mt = third.eval(null).asInstanceOf[ArrayData].toLongArray()
    new IvfCellModelL(cs, mt, twoLevelMin)
  }

  override protected def nullSafeEval(v: Any, c: Any, m: Any): Any =
    model.nearest(v.asInstanceOf[ArrayData], keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val mref = ctx.addReferenceObj("ivfModelL", model,
        classOf[IvfCellModelL].getName)
      val r = ctx.freshName("cellsOut")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  $mref.nearest($v, $keep);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NearestCellsMilli =
    copy(first = f, second = s, third = t)
}
