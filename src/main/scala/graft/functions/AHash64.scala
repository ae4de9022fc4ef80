package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** `ahash64(features)` — the 64-bit average-hash of a decoded feature
  * vector as ONE native per-row expression, packed as two BIGINT halves
  * `struct(lo, hi)` (bit 63 of a single long would overflow signed BIGINT
  * on the oracle side — the q_ann_hamming two-halves discipline).
  *
  * Semantics are bit-identical to the composed chain it replaces (and to
  * the unchanged DuckDB oracle in [[graft.ops.MultimodalQueries]]):
  * `b_i = CAST(round(CAST(f_i AS DOUBLE) * 255) AS BIGINT)` (round =
  * decimal HALF_UP exactly as Spark's `round` on doubles — BigDecimal on
  * the canonical decimal representation, NOT floor(x+0.5), which disagrees
  * on values like 0.49999999999999994), `sum = Σ b_i` over ALL elements,
  * bit `i` of the pack set iff `b_i·64 > sum` for `i < min(64, len)`.
  * Equality with the composed chain holds on the 64-element decode
  * contract (spec-pinned over the fixture + engineered edges); on
  * SHORTER arrays the composed form's `b[i]` indexing throws under ANSI,
  * where this expression defines the natural extension (bits only for
  * existing elements, empty → (0, 0) — spec-pinned separately). A null
  * element poisons the composed chain's sum to null, which zeroes every
  * bit — mirrored here ((0, 0), never a null struct; the decode seam
  * never emits null features, so this is defensive parity only).
  *
  * Why an expression: the composed form ran THREE interpreted
  * higher-order passes per row (a transform building a 64-element byte
  * array, an aggregate summing it, and two 32-iteration aggregate folds
  * packing the halves) plus the fanout-first Generate machinery needed to
  * keep the byte array from re-inlining into the fold lambdas. This loop
  * does the identical integer arithmetic in one codegen'd pass; the
  * single-element Generate barrier stays in the consumer so the struct's
  * two fields bind attributes instead of re-evaluating the hash twice
  * (projection collapse would substitute the expression per field
  * reference — the standing alias-substitution trap).
  */
case class AHash64(child: Expression) extends UnaryExpression {
  // input typing enforced by the registry builder (Cast to ARRAY<FLOAT>)

  override def dataType: DataType = StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    AHash64.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)

  override def prettyName: String = "ahash64"
}

object AHash64 {

  /** Static (callable from generated Java). */
  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    val m = math.min(64, n)
    val b = new Array[Long](m)
    var sum = 0L
    var anyNull = false
    var i = 0
    while (i < n && !anyNull) {
      if (a.isNullAt(i)) anyNull = true
      else {
        // Spark round(double, 0): BigDecimal.valueOf (canonical decimal
        // form) + HALF_UP — bit-compatible with the composed chain
        val r = java.math.BigDecimal.valueOf(a.getFloat(i).toDouble * 255.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        if (i < 64) b(i) = r
        sum += r
        i += 1
      }
    }
    var lo = 0L
    var hi = 0L
    if (!anyNull) {
      var j = 0
      while (j < m) {
        if (b(j) * 64L > sum) {
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        }
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](lo, hi))
  }
}
