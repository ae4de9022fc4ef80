package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `term_counts(text)` — the per-document term-frequency table
  * `ARRAY<STRUCT<term: STRING, tf: BIGINT>>` (terms sorted ascending), as
  * one native per-row expression.
  *
  * Tokenization contract, shared verbatim with the q_doc_tfidf DuckDB twin
  * and the composable Spark form it replaces:
  * `split(trim(lower(text)), '\\s+')` — lower-case first, strip leading and
  * trailing SPACE (0x20) characters only (SQL `trim` semantics — interior
  * tabs/newlines separate tokens but a leading tab yields a leading empty
  * token, exactly as the split form did), then Java-regex `\s+` splitting
  * with trailing empties kept (Spark's `split` limit = -1).
  *
  * Why an expression: a document's tokens are already co-located in its
  * row, so `groupBy(doc_id, term)` — the composable tf — re-shuffles data
  * that never needed to move. This computes tf INSIDE the scan: the
  * vocabulary aggregate downstream consumes (term) pairs straight off the
  * exploded array, and the per-(doc, term) exchange disappears from the
  * plan (q_doc_tfidf's scaladoc carries the full stage accounting).
  */
case class TermCounts(child: Expression) extends UnaryExpression {
  // input typing enforced by the registry builder (Cast to STRING) —
  // ExpectsInputTypes/AbstractDataType are sql-private in Spark 4

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(t: Any): Any =
    TermCountsImpl.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCountsImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)

  override def prettyName: String = "term_counts"
}

/** `query_term_stats(text, 'a', 'b', ...)` — document length + per-query-term
  * frequencies `STRUCT<dl: BIGINT, tf0: BIGINT, ...>` in ONE pass over the
  * tokens, as a native codegen'd per-row expression.
  *
  * Same tokenization contract as [[TermCounts]] (lower → trim → `\s+`
  * split, trailing empties kept). Why an expression: the composable form —
  * `size(split(...))` plus one `size(filter(w, x -> x = 't'))` per term —
  * evaluates N interpreted lambda passes over the token array per row
  * (higher-order functions never enter codegen), and BM25 needs the same
  * features on both the stats-aggregate side and the scoring side of its
  * scalar subquery, doubling that cost. This walks the tokens once per
  * row with direct string compares against the (literal, tiny) query term
  * list.
  */
case class QueryTermStats(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "query_term_stats needs at least one term")

  override def dataType: DataType = StructType(
    StructField("dl", LongType, nullable = false) +:
      terms.indices.map(i => StructField(s"tf$i", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  private lazy val model: QueryTermStatsModel = QueryTermStatsModel(terms)

  override def nullSafeEval(t: Any): Any =
    model.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qmodel", model,
      "graft.functions.QueryTermStatsModel")
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): QueryTermStats =
    copy(child = newChild)

  override def prettyName: String = "query_term_stats"
}

/** Precompiled term→slot lookup for [[QueryTermStats]], built once per
  * expression instance (not per row). Per token the hot loop does ONE hash
  * probe instead of a linear string-equals scan over the term list —
  * O(tokens) regardless of how many literal terms the registered SQL
  * function is called with (the shipped 4–8 term queries never noticed the
  * scan; an ad-hoc 200-term call would have gone quadratic). Duplicate
  * query terms are legal: they dedup into one counter that fans out to
  * every slot listing the term. */
case class QueryTermStatsModel(terms: Seq[String]) {

  // term → dense dedup index; slot k reads counter slotOf(k)
  @transient private lazy val lookup: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    terms.foreach(t => if (!m.containsKey(t)) m.put(t, m.size))
    m
  }
  @transient private lazy val slotOf: Array[Int] =
    terms.map(t => lookup.get(t).intValue).toArray

  // UTF-8 bytes of each deduped term, dense-indexed like the counters —
  // the fast path compares token byte runs against these directly
  @transient private lazy val termBytes: Array[Array[Byte]] = {
    val arr = new Array[Array[Byte]](lookup.size)
    terms.foreach { t =>
      val i = lookup.get(t).intValue
      if (arr(i) == null) arr(i) = t.getBytes("UTF-8")
    }
    arr
  }
  // linear term compare is a win only while the list is tiny; ad-hoc
  // many-term calls keep the String-keyed hash probe of the slow path
  @transient private lazy val useFast: Boolean = lookup.size <= 16

  def compute(t: UTF8String): InternalRow =
    if (useFast) computeFast(t) else computeSlow(t)

  /** The decode-everything reference path (also the >16-term path): Java
    * String + regex split + per-token hash probe. Semantics-defining —
    * [[computeFast]] must agree with this on every input (TermStatsSpec
    * cross-checks them). */
  private[functions] def computeSlow(t: UTF8String): InternalRow = {
    val toks = QueryTermStatsModel.WS.split(t.toLowerCase.trim.toString, -1)
    val counts = new Array[Long](lookup.size)
    var j = 0
    while (j < toks.length) {
      val idx = lookup.get(toks(j))
      if (idx != null) counts(idx.intValue) += 1L
      j += 1
    }
    emit(toks.length.toLong, counts)
  }

  /** One pass over the raw UTF-8 bytes — no String decode, no regex, no
    * per-token allocation (measured ~5× on the sf0.1 BM25 corpus pass;
    * this sits under every registered BM25 variant and q_hybrid_rrf).
    *
    * Why bytewise splitting is exact: the split delimiters `\s` =
    * {0x09–0x0D, 0x20} are single UTF-8 bytes that can never appear
    * inside a multibyte sequence, Unicode lowercasing maps no character
    * into or out of that set, and `trim` strips 0x20 only — so token
    * BOUNDARIES computed on raw bytes equal the reference path's. Token
    * count: Java `split(-1)` yields (whitespace runs + 1) pieces on the
    * trimmed string (leading/trailing runs contribute their empty piece;
    * the empty string splits to one piece). Pure-ASCII tokens lowercase
    * bytewise; a token with any non-ASCII byte falls back to the exact
    * UTF8String kernels of the slow path (Unicode edge cases like
    * U+212A KELVIN → 'k' lowercase INTO ASCII, so the fallback compares
    * through the same lowercase map — per-token context equals
    * whole-string context because tokens are ws/end-delimited on both
    * sides, which is what Java's final-sigma rule keys on). */
  private[functions] def computeFast(t: UTF8String): InternalRow = {
    val n = t.numBytes
    var start = 0
    var end = n
    while (start < end && t.getByte(start) == 0x20) start += 1
    while (end > start && t.getByte(end - 1) == 0x20) end -= 1
    val counts = new Array[Long](lookup.size)
    var dl = 1L
    var i = start
    var tokStart = start
    while (i < end) {
      val b = t.getByte(i)
      if (b == 0x20 || (b >= 0x09 && b <= 0x0D)) {
        if (i > tokStart) matchToken(t, tokStart, i, counts)
        dl += 1L
        i += 1
        var ws = true
        while (ws && i < end) {
          val c = t.getByte(i)
          if (c == 0x20 || (c >= 0x09 && c <= 0x0D)) i += 1 else ws = false
        }
        tokStart = i
      } else i += 1
    }
    if (end > tokStart) matchToken(t, tokStart, end, counts)
    emit(dl, counts)
  }

  /** Count token `[s, e)` against the term list: ASCII-lowercase byte
    * compare; any non-ASCII byte routes the token through the reference
    * lowercase kernel. Dense term indices are unique, so at most one
    * counter matches. */
  private def matchToken(t: UTF8String, s: Int, e: Int,
                         counts: Array[Long]): Unit = {
    var i = s
    while (i < e) {
      if (t.getByte(i) < 0) { matchTokenNonAscii(t, s, e, counts); return }
      i += 1
    }
    val len = e - s
    var k = 0
    while (k < termBytes.length) {
      val tb = termBytes(k)
      if (tb.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          var b = t.getByte(s + j)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          if (b != tb(j)) ok = false
          j += 1
        }
        if (ok) { counts(k) += 1L; return }
      }
      k += 1
    }
  }

  private def matchTokenNonAscii(t: UTF8String, s: Int, e: Int,
                                 counts: Array[Long]): Unit = {
    val arr = new Array[Byte](e - s)
    var j = 0
    while (j < arr.length) { arr(j) = t.getByte(s + j); j += 1 }
    val tok = UTF8String.fromBytes(arr).toLowerCase.toString
    val idx = lookup.get(tok)
    if (idx != null) counts(idx.intValue) += 1L
  }

  private def emit(dl: Long, counts: Array[Long]): InternalRow = {
    val out = new Array[Any](slotOf.length + 1)
    out(0) = dl
    var k = 0
    while (k < slotOf.length) { out(k + 1) = counts(slotOf(k)); k += 1 }
    new GenericInternalRow(out)
  }
}

object QueryTermStatsModel {
  private val WS = java.util.regex.Pattern.compile("\\s+")
}

/** Static helper (separate object so generated Java calls a plain static
  * method — no companion-forwarder subtleties). */
object TermCountsImpl {

  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** (term, tf) rows for `t`, terms sorted ascending (deterministic output
    * independent of hash-map iteration order). */
  def compute(t: UTF8String): ArrayData = {
    // UTF8String.toLowerCase / trim are the exact kernels Spark's lower()
    // and trim() evaluate, so tokenization is bit-identical to the
    // composable form on any input
    val s = t.toLowerCase.trim.toString
    val toks = WS.split(s, -1)
    val counts = new java.util.HashMap[String, Array[Long]](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val c = counts.get(toks(i))
      if (c == null) counts.put(toks(i), Array(1L)) else c(0) += 1L
      i += 1
    }
    val terms = counts.keySet.toArray(new Array[String](counts.size))
    java.util.Arrays.sort(terms, java.util.Comparator.naturalOrder[String]())
    val out = new Array[Any](terms.length)
    i = 0
    while (i < terms.length) {
      out(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(terms(i)), counts.get(terms(i))(0))): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }
}
