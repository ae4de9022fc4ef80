package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text, gramLen, window)` — the distinct winnowing fingerprint
  * set of a document, as one native per-row expression.
  *
  * Semantics (shared verbatim with the DuckDB oracle in
  * [[graft.ops.TextQueries]]): gram hash `gh(i) = Σ_{j<gramLen}
  * codepoint(t[i+j]) * 31^(gramLen-1-j)` over every gram start, then the
  * minimum over each `window` consecutive gram positions (full windows
  * only), distinct per document.
  *
  * Why an expression and not a window query: the composable form explodes
  * one row per CHARACTER and runs two `Window` passes (8 `lead`s + a
  * sliding `min`) over a doc-partitioned sort — at sf0.1 that is ~5M
  * shuffled rows and the sort/GC footprint made it the bench's worst
  * contention amplifier (driver-recorded 20.7 s vs 1.7 s isolated). This
  * expression does the identical integer arithmetic in a rolling-hash loop
  * per row: zero shuffles, no explode, and the per-doc distinct happens in
  * the output array, so the downstream `explode` needs no global DISTINCT.
  * That is the shape that survives 100 TB — fingerprinting is
  * embarrassingly parallel and nothing here forgets that.
  */
case class WinnowFingerprint(child: Expression, gramLen: Int, window: Int)
    extends UnaryExpression {
  // input typing enforced by the registry builder (Cast to STRING) —
  // ExpectsInputTypes/AbstractDataType are sql-private in Spark 4

  require(gramLen >= 1 && gramLen <= 64, s"gramLen must be in [1,64], got $gramLen")
  require(window >= 1 && window <= 64, s"window must be in [1,64], got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(t: Any): Any =
    WinnowHash.compute(t.asInstanceOf[UTF8String], gramLen, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowHash.compute($c, $gramLen, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

/** Static helper (separate object so generated Java calls a plain static
  * method — no companion-forwarder subtleties). */
object WinnowHash {

  private val BASE = 31L

  /** Distinct winnowing fingerprints of `t`, sorted ascending. Returns an
    * empty array when the text has no full gram window. */
  def compute(t: UTF8String, gramLen: Int, window: Int): ArrayData = {
    // codepoints, matching DuckDB `unicode(substr(t, i, 1))` per character
    val codes = t.toString.codePoints().toArray
    val n = codes.length
    val ng = n - gramLen + 1
    val nw = ng - window + 1 // number of full windows
    if (nw <= 0) return new GenericArrayData(Array.emptyLongArray)

    var pow = 1L // BASE^(gramLen-1)
    var j = 1
    while (j < gramLen) { pow *= BASE; j += 1 }

    // rolling polynomial gram hashes (exact Long arithmetic — identical to
    // the direct Σ codes(i+j)*31^(gramLen-1-j) sum, no modulus)
    val gh = new Array[Long](ng)
    var h = 0L
    j = 0
    while (j < gramLen) { h = h * BASE + codes(j); j += 1 }
    gh(0) = h
    var i = 1
    while (i < ng) {
      h = (h - codes(i - 1) * pow) * BASE + codes(i + gramLen - 1)
      gh(i) = h
      i += 1
    }

    // sliding min over `window` gram positions (window is small — direct scan)
    val fps = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var m = gh(i)
      var w = 1
      while (w < window) { if (gh(i + w) < m) m = gh(i + w); w += 1 }
      fps(i) = m
      i += 1
    }

    // distinct (sorted) — per-doc dedup here removes the need for a global
    // DISTINCT shuffle after the explode
    java.util.Arrays.sort(fps)
    var out = 1
    i = 1
    while (i < nw) {
      if (fps(i) != fps(out - 1)) { fps(out) = fps(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(fps, out))
  }
}
