package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `dsir_counts(tc, is_target, B)` — DSIR's two hashed-bucket token-count
  * tables as ONE aggregate over per-document `term_counts` arrays.
  *
  * Returns `STRUCT<r: ARRAY<BIGINT>, t: ARRAY<BIGINT>>` (dense, position =
  * bucket): for every (term, tf) entry, bucket `md5_low63(term) mod B`
  * accumulates `tf` into `r` (the RAW/full-corpus table) and, when
  * `is_target` is true, into `t` (the TARGET table) — exactly the
  * integers of the explode → groupBy(bucket) fit it replaces
  * ([[graft.ops.CorpusQueries.importanceWeights]]), so the DuckDB twin
  * and the streaming scorer cannot drift. A null `is_target` counts as
  * not-target (the `when(is_t, cnt).otherwise(0)` semantics); a null
  * `tc` contributes nothing.
  *
  * Why an aggregate: the composed fit exploded one row per (doc, term)
  * through a bucket exchange and then a whole-frame window + range-fill
  * join, to produce tables whose size was FIXED at B from the start —
  * same story as [[BigramCountsAgg]]. Each map task owns one 2B-long
  * array (16 KB at the production B = 1024), merge is element-wise
  * addition, and the dense tables fall out of the final merge with no
  * fill job; the grand totals the weight formula needs are in-plan
  * `aggregate()`s over the B-long result arrays, evaluated once in the
  * same scalar subquery. */
case class DsirCountsAgg(tc: Expression, isTarget: Expression, b: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(b >= 1 && b <= (1 << 24), s"dsir_counts B must be bounded: got $b")

  override def children: Seq[Expression] = Seq(tc, isTarget)

  override def dataType: DataType = StructType(Seq(
    StructField("r", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("t", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * b)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = tc.eval(input)
    if (v != null) {
      val isT = isTarget.eval(input) match {
        case java.lang.Boolean.TRUE => true
        case _ => false // false OR null: when(is_t, cnt).otherwise(0)
      }
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val e = arr.getStruct(i, 2)
        // tf is nullable in the registered SQL signature; a null tf entry
        // from a direct SQL caller contributes nothing (clean skip) rather
        // than reading undefined buffer bytes.
        if (e != null && !e.isNullAt(0) && !e.isNullAt(1)) {
          val bucket = (Md5Low63.compute(e.getUTF8String(0)) % b).toInt
          val tf = e.getLong(1)
          buf(bucket) += tf
          if (isT) buf(b + bucket) += tf
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
    val r = new Array[Any](b)
    val t = new Array[Any](b)
    var i = 0
    while (i < b) { r(i) = buf(i); t(i) = buf(b + i); i += 1 }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(r), new GenericArrayData(t)))
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

  override def withNewMutableAggBufferOffset(o: Int): DsirCountsAgg =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): DsirCountsAgg =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DsirCountsAgg =
    copy(tc = c(0), isTarget = c(1))

  override def prettyName: String = "dsir_counts"
}
