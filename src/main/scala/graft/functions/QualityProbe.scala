package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `probe_gram(tc, y, B, FS)` — the EXACT sufficient statistics of a
  * ridge-regression linear quality probe, in ONE corpus pass.
  *
  * The probe's feature vector per document is integer by construction —
  * hashed bag-of-words buckets `x[b] = (tf_b · FS) div dl` for
  * `b = md5_low63(term) mod B` (bucket counts summed BEFORE the one
  * truncating division, so hash collisions fold first), plus a constant
  * bias feature `x[B] = FS` — so the normal-equation statistics
  * `XᵀX` (Gram), `Xᵀy` and `n` are integer sums: exactly reproducible on
  * any engine, any partitioning, any merge order. This is the classic
  * one-pass distributed least squares (Chu et al., "Map-Reduce for
  * Machine Learning on Multicore", NIPS 2006): the corpus-sized work is
  * ONE ObjectHashAggregate whose buffer is the (B+1)(B+2)/2-long upper
  * triangle + (B+1) Xᵀy + 1 count — ~270 KB at the default B = 256,
  * BOUNDED at any corpus size — and the (B+1)×(B+1) solve happens on the
  * driver afterwards (the k·dim driver-floats pattern of the IVF
  * quantizer). Full-batch gradient descent was prototyped first and
  * REJECTED: 4–8 integer GD rounds leave the informative low-variance
  * (stopword-density) direction unlearned (accuracy = majority class),
  * while the closed form separates at 94–95%% on the fixture — and GD
  * costs R corpus passes to this aggregate's one.
  *
  * Returns `ARRAY<STRUCT<i:INT, j:INT, v:BIGINT>>` — dense upper-triangle
  * Gram cells (i ≤ j ≤ B), then `Xᵀy` as (i, B+1), then `n` at
  * (B+1, B+1), zeros included, so the output is a fixed
  * (B+1)(B+2)/2 + B + 2 rows whose values hash-compare cross-engine.
  *
  * Overflow headroom: a Gram cell grows by at most FS² per document, so
  * int64 holds ~2⁶³/FS² ≈ 1.4·10¹⁴ documents at the default FS = 256 —
  * beyond any 100 TB corpus. A null `tc` or null `y` contributes nothing
  * (not even to n), matching the twin's `WHERE text IS NOT NULL`. */
case class ProbeGramAgg(tc: Expression, y: Expression, b: Int, fs: Int,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(b >= 1 && b <= 4096, s"probe_gram B must be in [1, 4096], got $b")
  require(fs >= 1 && fs <= 65536, s"probe_gram FS must be in [1, 65536], got $fs")

  private val nf = b + 1                 // features incl. bias
  private val tri = nf * (nf + 1) / 2    // upper-triangle cells
  private val len = tri + nf + 1         // + Xᵀy + n

  override def children: Seq[Expression] = Seq(tc, y)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  private def triIdx(i: Int, j: Int): Int = i * nf - i * (i - 1) / 2 + (j - i)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val tcV = tc.eval(input)
    val yV = y.eval(input)
    if (tcV == null || yV == null) return buf
    val arr = tcV.asInstanceOf[ArrayData]
    val label = yV.asInstanceOf[Long]
    val n = arr.numElements()
    // fold bucket counts first (collisions sum BEFORE the division).
    // First-touch tracking uses explicit seen flags, NOT counts(bucket)==0:
    // hostile direct-SQL inputs with tf = 0 (or negatives summing back to
    // zero) would re-append the same bucket and overflow `active`.
    val counts = new Array[Long](b)
    val seen = new Array[Boolean](b)
    val active = new Array[Int](math.min(n, b))
    var nActive = 0
    var dl = 0L
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, 2)
      if (e != null && !e.isNullAt(0) && !e.isNullAt(1)) {
        val tf = e.getLong(1)
        val bucket = Math.floorMod(Md5Low63.compute(e.getUTF8String(0)), b.toLong).toInt
        if (!seen(bucket)) { seen(bucket) = true; active(nActive) = bucket; nActive += 1 }
        counts(bucket) += tf
        dl += tf
      }
      i += 1
    }
    if (dl <= 0L) return buf
    // features: truncating x = tf·FS / dl over active buckets, + bias
    java.util.Arrays.sort(active, 0, nActive)
    val fb = new Array[Int](nActive + 1)
    val fx = new Array[Long](nActive + 1)
    var m = 0
    var k = 0
    while (k < nActive) {
      val x = counts(active(k)) * fs / dl
      if (x > 0L) { fb(m) = active(k); fx(m) = x; m += 1 }
      k += 1
    }
    fb(m) = b; fx(m) = fs.toLong; m += 1
    // Gram upper triangle + Xᵀy + n
    var a = 0
    while (a < m) {
      var c = a
      while (c < m) {
        buf(triIdx(fb(a), fb(c))) += fx(a) * fx(c)
        c += 1
      }
      if (label == 1L) buf(tri + fb(a)) += fx(a)
      a += 1
    }
    buf(len - 1) += 1L
    buf
  }

  override def merge(x: Array[Long], y2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y2(i); i += 1 }
    x
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = new Array[Any](len)
    var out = 0
    var i = 0
    while (i <= b) {
      var j = i
      while (j <= b) {
        rows(out) = new GenericInternalRow(Array[Any](i, j, buf(triIdx(i, j))))
        out += 1
        j += 1
      }
      i += 1
    }
    i = 0
    while (i <= b) {
      rows(out) = new GenericInternalRow(Array[Any](i, b + 1, buf(tri + i)))
      out += 1
      i += 1
    }
    rows(out) = new GenericInternalRow(Array[Any](b + 1, b + 1, buf(len - 1)))
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ProbeGramAgg =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): ProbeGramAgg =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ProbeGramAgg =
    copy(tc = c(0), y = c(1))

  override def prettyName: String = "probe_gram"
}

/** `probe_score(tc, wv, FS)` — the probe's per-document score
  * `Σ_b x_b · w[b] + FS · w[B]`, with the IDENTICAL integer feature
  * construction as [[ProbeGramAgg]] (bucket count fold → one truncating
  * division → ascending-bucket iteration, B = size(wv) − 1). The weight
  * vector is the driver-solved ridge solution riding the plan as one
  * literal array — ZERO exchanges on the scoring side; every document
  * scores where it already sits. The double summation iterates buckets
  * ascending, so the score is deterministic per engine; cross-engine
  * agreement is a tolerance contract (the solve itself is float), checked
  * by tools/check_tolerance.py. Null text → null score. */
case class ProbeScore(tc: Expression, wv: Expression, fs: Int)
    extends Expression with CodegenFallback {

  require(fs >= 1, s"probe_score FS must be positive, got $fs")

  override def children: Seq[Expression] = Seq(tc, wv)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val tcV = tc.eval(input)
    val wvV = wv.eval(input)
    if (tcV == null || wvV == null) return null
    val arr = tcV.asInstanceOf[ArrayData]
    val w = wvV.asInstanceOf[ArrayData]
    val b = w.numElements() - 1
    if (b < 1) return null
    // Explicit seen flags for first-touch (same hardening as ProbeGramAgg:
    // tf = 0 / negative-sum inputs must not re-append a bucket).
    val counts = new Array[Long](b)
    val seen = new Array[Boolean](b)
    val active = new Array[Int](math.min(arr.numElements(), b))
    var nActive = 0
    var dl = 0L
    var i = 0
    while (i < arr.numElements()) {
      val e = arr.getStruct(i, 2)
      if (e != null && !e.isNullAt(0) && !e.isNullAt(1)) {
        val tf = e.getLong(1)
        val bucket = Math.floorMod(Md5Low63.compute(e.getUTF8String(0)), b.toLong).toInt
        if (!seen(bucket)) { seen(bucket) = true; active(nActive) = bucket; nActive += 1 }
        counts(bucket) += tf
        dl += tf
      }
      i += 1
    }
    if (dl <= 0L) return null
    java.util.Arrays.sort(active, 0, nActive)
    var s = 0.0
    var k = 0
    while (k < nActive) {
      val x = counts(active(k)) * fs / dl
      if (x > 0L) s += x.toDouble * w.getDouble(active(k))
      k += 1
    }
    s + fs.toDouble * w.getDouble(b)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ProbeScore =
    copy(tc = c(0), wv = c(1))

  override def prettyName: String = "probe_score"
}
