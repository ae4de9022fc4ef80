package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Per-document hashed-bigram LM fluency sums — the scoring loop of
  * [[graft.ops.TextQueries.lmFluency]] as ONE flat primitive pass.
  *
  * `bigram_fluency(h, c1, c2)` takes the doc's token-hash array and the
  * two dense bucket-count arrays (position = bucket id; bucket counts B1 =
  * `size(c1)`, B2 = `size(c2)` are taken from the arrays, so the
  * expression carries no constants of its own) and returns
  * `struct(n = max(0, size(h)−1), s = Σ round((c2[b2]+1)/(c1[b1]+B2)·2^20))`
  * with `b1 = hᵢ mod B1`, `b2 = ((hᵢ mod B2)·31 + hᵢ₊₁ mod B2) mod B2`.
  *
  * Why native: the composable form — `aggregate(sequence(1, size(h)−1),
  * struct, (a,i) -> …)` — allocates a struct per bigram and evaluates the
  * whole lambda interpreter per element; measured 2.19 s vs this loop's
  * sub-second at sf0.1 (and a map-scalar lookup variant was worse still:
  * Spark's map `element_at` linear-scans the entries). CodegenFallback is
  * deliberate: the expression evaluates once per DOCUMENT (the loop over
  * bigrams lives inside), so per-row boxing is noise.
  *
  * Arithmetic contract (bit-compatible with the HOF form, the DuckDB twin
  * and the streaming scorer): the two adds, one divide, one multiply are
  * correctly-rounded IEEE doubles in the twin's op order, and the half-up
  * round replicates Spark's own `round()` path exactly —
  * `BigDecimal.valueOf(x).setScale(0, HALF_UP)` (decimal-string
  * semantics), NOT `Math.round` (floor(x+0.5), which disagrees just below
  * .5 boundaries where the +0.5 itself rounds up in binary).
  *
  * Null array → null; any null element → null (matches element_at
  * propagation in the HOF form). Out-of-range bucket counts are impossible
  * by construction (buckets are mods of the array sizes). The function is
  * registered for general SQL use, so it also hardens the preconditions
  * its internal call sites guarantee by construction: an EMPTY count array
  * returns null (a model with zero buckets has no opinion — not an
  * `x % 0` ArithmeticException), and bucket ids use floor-mod so a
  * negative hash element (md5_low63 never emits one, but direct SQL can)
  * indexes a valid bucket instead of throwing
  * ArrayIndexOutOfBoundsException; for the non-negative hashes every
  * internal caller produces, floor-mod and `%` agree bit-for-bit. */
case class BigramFluency(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(hAny: Any, c1Any: Any, c2Any: Any): Any = {
    val h = hAny.asInstanceOf[ArrayData]
    val c1 = c1Any.asInstanceOf[ArrayData]
    val c2 = c2Any.asInstanceOf[ArrayData]
    val n1 = c1.numElements().toLong
    val n2 = c2.numElements().toLong
    if (n1 == 0 || n2 == 0) return null
    val len = h.numElements()
    val d2 = n2.toDouble
    var s = 0L
    var i = 0
    while (i < len - 1) {
      if (h.isNullAt(i) || h.isNullAt(i + 1)) return null
      val a = h.getLong(i)
      val b = h.getLong(i + 1)
      val b1 = java.lang.Math.floorMod(a, n1).toInt
      val b2 = java.lang.Math.floorMod(
        java.lang.Math.floorMod(a, n2) * 31L +
          java.lang.Math.floorMod(b, n2), n2).toInt
      val x = (c2.getLong(b2) + 1.0) / (c1.getLong(b1) + d2) * 1048576.0
      s += java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    new GenericInternalRow(Array[Any](math.max(0, len - 1).toLong, s))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BigramFluency =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bigram_fluency"
}
