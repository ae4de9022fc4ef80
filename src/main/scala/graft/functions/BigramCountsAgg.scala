package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `bigram_counts(h, B1, B2)` — the hashed-bigram LM's two bounded count
  * tables as ONE aggregate over per-document token-hash arrays.
  *
  * Returns `STRUCT<c1: ARRAY<BIGINT>, c2: ARRAY<BIGINT>>` — DENSE arrays
  * (position = bucket id) with `c1[h_i mod B1] += 1` and
  * `c2[((h_i mod B2)·31 + h_{i+1} mod B2) mod B2] += 1` for every
  * consecutive hash pair, exactly the arithmetic of
  * [[graft.ops.TextQueries.lmFluency]]'s fit and of [[BigramFluency]]'s
  * score side.
  *
  * Why an aggregate: the composed fit — explode one row per bigram,
  * stack(2) into (kind, bucket), hash-aggregate, then a range(B1+B2)
  * left-join job to densify — streams 2 rows per corpus bigram through an
  * exchange to produce tables whose size was FIXED from the start. This
  * folds the whole fit into ObjectHashAggregate partials: each map task
  * owns one (B1+B2)-long array (~0.5 MB at the production 1024/65536 —
  * bounded at ANY corpus size, which is the design point of the hashed
  * LM), merge is element-wise addition (associative/commutative), and the
  * dense arrays fall out of the final merge with no fill job.
  *
  * A null input array contributes nothing; null ELEMENTS (impossible from
  * md5_low63 over split tokens) skip the adjacent pairs rather than
  * poisoning the table. Buckets use floor-mod — bit-identical to the
  * composed form's `%` for the non-negative hashes internal callers
  * produce, but a direct SQL caller injecting a negative long gets a
  * valid bucket instead of a task-killing AIOOBE, matching the
  * [[BigramFluency]] scoring-side hardening (r10). */
case class BigramCountsAgg(h: Expression, b1: Int, b2: Int,
                           override val mutableAggBufferOffset: Int = 0,
                           override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(b1 >= 1 && b2 >= 1 && b1.toLong + b2 <= (1 << 26),
    s"bigram_counts tables must be bounded: got b1=$b1 b2=$b2")

  override def children: Seq[Expression] = Seq(h)

  override def dataType: DataType = StructType(Seq(
    StructField("c1", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("c2", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](b1 + b2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = h.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n - 1) {
        if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
          val a = arr.getLong(i)
          val b = arr.getLong(i + 1)
          // floorMod: bit-identical to % for the non-negative md5_low63
          // hashes internal callers produce, but a direct SQL caller can
          // pass a negative long — % would index negative and kill the
          // task (matches the BigramFluency hardening).
          buf(Math.floorMod(a, b1.toLong).toInt) += 1L
          buf(b1 + Math.floorMod(
            Math.floorMod(a, b2.toLong) * 31L + Math.floorMod(b, b2.toLong),
            b2.toLong).toInt) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def eval(buf: Array[Long]): Any = {
    val c1 = new Array[Any](b1)
    val c2 = new Array[Any](b2)
    var i = 0
    while (i < b1) { c1(i) = buf(i); i += 1 }
    i = 0
    while (i < b2) { c2(i) = buf(b1 + i); i += 1 }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(c1), new GenericArrayData(c2)))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
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

  override def withNewMutableAggBufferOffset(o: Int): BigramCountsAgg =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): BigramCountsAgg =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BigramCountsAgg =
    copy(h = c(0))

  override def prettyName: String = "bigram_counts"
}
