package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `hplane_sig(embedding, nPlanes)` — random-hyperplane LSH signature of a
  * float vector as one native codegen'd expression: bit `p` of the result is
  * set iff `Σ_j emb[j] * h(p, j+1) >= 0`, with the hyperplane signs
  * `h ∈ {+1, -1}` derived from md5 parity (see [[HyperplaneSig.sign]]) — a
  * deterministic family both engines can reproduce (the DuckDB oracle gets
  * the identical sign matrix interpolated as SQL literals).
  *
  * Replaces an interpreted `aggregate(sequence(...), ... zip_with(...))`
  * higher-order-function pipeline — HOF lambdas are CodegenFallback in
  * Spark 4 and were the suite's last interpreted hot path. Arithmetic is
  * float element promoted to double, accumulated in element order: exactly
  * the sequence the HOF form produced, so scores and buckets are unchanged.
  *
  * Scale note: the signature is per-row work inside the scan (no shuffle);
  * the sign matrix is a process-wide constant table computed once per
  * (nPlanes, dim) and cached — never per row, never shipped with the plan.
  */
case class HyperplaneSig(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  // input typing enforced by the registry builder — ExpectsInputTypes /
  // AbstractDataType are sql-private in Spark 4

  require(nPlanes >= 1 && nPlanes <= 31, s"nPlanes must be in [1,31], got $nPlanes")

  override def dataType: DataType = IntegerType

  // an EMPTY embedding yields NULL even when the child never does: the
  // oracle's UNNEST produces no rows for it, so the vector is absent from
  // the signature CTE — NULL reproduces that (a null bucket never
  // equi-joins, dropping the row exactly like the oracle's missing one)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.compute(v.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""
        java.lang.Integer $tmp = graft.functions.HyperplaneSig.compute($c, $nPlanes);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.intValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  override def prettyName: String = "hplane_sig"
}

object HyperplaneSig {

  /** Hyperplane sign h(p, i) ∈ {+1.0, -1.0}: parity of the first hex digit
    * of md5("p:i"). The 1-based `i` matches the original published family
    * (planes were generated for i in 1..dim). */
  def sign(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val firstByte = md.digest(s"$p:$i".getBytes("UTF-8"))(0)
    // first hex digit = high nibble; parity*2-1 ∈ {-1, +1}
    (((firstByte >> 4) & 0xf) % 2) * 2.0 - 1.0
  }

  /** The full sign matrix for (nPlanes, dim) — used by the oracle-SQL
    * builder to interpolate identical literals into DuckDB. */
  def matrix(nPlanes: Int, dim: Int): Array[Array[Double]] =
    (0 until nPlanes).map(p => (1 to dim).map(i => sign(p, i)).toArray).toArray

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  /** Static entry point for generated Java: signature of one vector.
    * Boxed return — NULL for an empty array (the oracle's UNNEST emits no
    * rows, so the vector is absent from its signature CTE). A non-empty
    * array whose elements are ALL null yields 0: each per-plane SUM over
    * all-NULL terms is NULL on the oracle side, `CASE WHEN NULL >= 0` is
    * not-true, and every bit falls to the ELSE 0 — previously Spark's
    * acc=0.0 >= 0 set every bit instead (latent divergence, ADVICE r4). */
  def compute(emb: ArrayData, nPlanes: Int): java.lang.Integer = {
    val dim = emb.numElements()
    if (dim == 0) return null
    var anyNonNull = false
    var j0 = 0
    while (j0 < dim && !anyNonNull) {
      if (!emb.isNullAt(j0)) anyNonNull = true
      j0 += 1
    }
    if (!anyNonNull) return 0
    val m = cache.computeIfAbsent((nPlanes, dim), { k => matrix(k._1, k._2) })
    var sig = 0
    var p = 0
    while (p < nPlanes) {
      val h = m(p)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        // float → double promotion then ordered accumulation: identical to
        // the zip_with/aggregate HOF this replaced and to the oracle's
        // SUM(CAST(x AS DOUBLE) * h) over lockstep UNNESTs. Null elements
        // contribute 0 (SUM skips NULLs on the oracle side too).
        if (!emb.isNullAt(j)) acc += emb.getFloat(j).toDouble * h(j)
        j += 1
      }
      if (acc >= 0) sig |= 1 << p
      p += 1
    }
    sig
  }
}
