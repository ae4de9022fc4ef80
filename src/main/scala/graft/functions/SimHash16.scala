package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash16(text)` — the document's whole 16-bit SimHash as ONE native
  * per-row expression.
  *
  * Semantics are bit-identical to the composed pipeline it replaces (and to
  * the unchanged DuckDB oracle in [[graft.ops.DedupQueries]]):
  * `w = split(trim(text), '\s+')`; per word, `h = md5(w)` and hex digit
  * `i ∈ [1,16]` votes `+1` if its low bit is set else `-1`
  * (`(instr('0123456789abcdef', substring(h, i, 1)) - 1) % 2`); output bit
  * `i-1` is set iff the summed vote is `>= 0`.
  *
  * The split reproduces the composed form's corner cases exactly: trim is
  * ASCII-space-only (Spark `trim` == DuckDB `trim`, NOT Java's
  * `String.trim`), and the split is Java `Pattern.split` with limit -1
  * (Spark's `split` default) — so text wrapped in non-space whitespace
  * (tabs/newlines) yields the same empty-string tokens, which hash like any
  * other word, and an empty text yields exactly one `""` token.
  *
  * Why an expression: the composed form explodes ONE ROW PER WORD
  * (allocating a 32-char hex string each) and shuffles 16 longs per doc
  * through a groupBy — at sf0.1 that is ~750k exploded rows, and the
  * allocation churn made q_simhash the suite's most load-amplified query
  * (3.2× under the churn A/B; everything else ≤1.6×). This loop does the
  * identical integer arithmetic per row: zero shuffles, no explode, no hex
  * strings, one md5 per word. SimHash is embarrassingly parallel — the
  * 100 TB shape is per-row work inside the scan, and now it is.
  */
case class SimHash16(child: Expression) extends UnaryExpression {
  // input typing enforced by the registry builder (Cast to STRING) —
  // ExpectsInputTypes/AbstractDataType are sql-private in Spark 4

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(t: Any): Any =
    SimHash16.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)

  override def prettyName: String = "simhash16"
}

object SimHash16 {

  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Static (callable from generated Java): the full-document 16-bit
    * SimHash. One md5 per whitespace token, votes accumulated locally. */
  def compute(t: UTF8String): Long = {
    val str = t.toString
    // ASCII-space-only trim — Spark/DuckDB `trim` semantics (Java's
    // String.trim would also strip tabs/newlines and change the token list)
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    // Java Pattern.split with limit -1 == Spark `split(str, '\s+')`
    val words = str.substring(b, e).split("\\s+", -1)

    val md = tlMd5.get()
    val votes = new Array[Int](16)
    var wi = 0
    while (wi < words.length) {
      md.reset()
      val d = md.digest(words(wi).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // hex digit i (1-based) = nibble i-1: byte (i-1)/2, high nibble first;
      // its low bit is the vote — +1 when set, -1 when clear
      var i = 0
      while (i < 16) {
        val nib =
          if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf
          else d(i >> 1) & 0xf
        votes(i) += (if ((nib & 1) == 1) 1 else -1)
        i += 1
      }
      wi += 1
    }
    var out = 0L
    var i = 0
    while (i < 16) {
      if (votes(i) >= 0) out |= 1L << i
      i += 1
    }
    out
  }
}
