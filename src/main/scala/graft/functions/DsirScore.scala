package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** `dsir_score(tc, wv)` — one document's DSIR token count and importance
  * score in a single flat pass: for every `(term, tf)` entry of the
  * per-row `term_counts` array, `n += tf` and
  * `s += tf · wv[md5_low63(term) mod size(wv)]` against the dense
  * fixed-point weight table ([[DsirCountsAgg]]'s bucket space — the
  * bucket count is taken from the array length, so the expression
  * carries no constant of its own). Returns `STRUCT<n: BIGINT,
  * s: BIGINT>`; null `tc` or `wv` → null.
  *
  * Why native: the composable form — `aggregate(term_counts(text),
  * struct, (a, tc) -> …)` — allocates a struct per entry and walks the
  * whole lambda tree interpreted, including a per-entry `md5_low63`
  * dispatch; the [[BigramFluency]] trade, applied to DSIR's scorer.
  * CodegenFallback is deliberate: one evaluation per DOCUMENT with the
  * loop inside. Arithmetic is the exact integer sum of the HOF form
  * (longs, same bucket arithmetic as the fit aggregate), so the twin and
  * the streaming scorer are untouched. */
case class DsirScore(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(tcAny: Any, wvAny: Any): Any = {
    val tc = tcAny.asInstanceOf[ArrayData]
    val wv = wvAny.asInstanceOf[ArrayData]
    val b = wv.numElements().toLong
    if (b == 0) return null
    val len = tc.numElements()
    var n = 0L
    var s = 0L
    var i = 0
    while (i < len) {
      val e = tc.getStruct(i, 2)
      // tf is nullable in the registered SQL signature; a null tf entry
      // contributes nothing rather than reading undefined buffer bytes.
      if (e != null && !e.isNullAt(0) && !e.isNullAt(1)) {
        val tf = e.getLong(1)
        n += tf
        s += tf * wv.getLong((Md5Low63.compute(e.getUTF8String(0)) % b).toInt)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, s))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DsirScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dsir_score"
}
