package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `arg_last_event(cond, tsu, event_id, event_type, value)` — the
  * latest-row argmax of [[graft.ops.EventQueries.cdcMergeOf]] as a typed
  * aggregate: among input rows where `cond`, keep the row with the maximum
  * (tsu, event_id) — exactly the row `max(when(cond, struct(tsu, event_id,
  * event_type, value)))` keeps, since event_id is unique so the struct
  * comparison never reaches fields 3–4 — and return it as
  * `STRUCT<tsu BIGINT, event_id BIGINT, event_type STRING, value DOUBLE>`
  * (NULL when no row matched, as max-over-empty reads).
  *
  * Why (VERDICT r18 #3): `max(struct(...))` is not hash-aggregable (the
  * struct buffer is not an UnsafeRow mutable type), so the whole aggregate
  * plans as SortAggregate — partial-sort of the full event stream on the
  * map side, exchange, sort again. The string payload blocks the
  * DECIMAL(38,0) packing that fixed q_attribution_last. This aggregate
  * runs as ObjectHashAggregate: map-side partials keep one 40-byte buffer
  * per group in a hash table, no sort of the stream ever happens, and only
  * one buffer per group per partition crosses the shuffle.
  *
  * Ordering parity with max(struct): field-by-field, NULL smallest —
  * a NULL tsu loses to any non-null tsu; among NULL-tsu rows event_id
  * decides (fixture event_ids are non-null). Deterministic and
  * merge-order-free because (tsu, event_id) is a total order per group.
  */
case class ArgLastEventAgg(condExpr: Expression, tsuExpr: Expression,
                           idExpr: Expression, typeExpr: Expression,
                           valueExpr: Expression,
                           override val mutableAggBufferOffset: Int = 0,
                           override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgLastEventAgg.Buf] {

  override def children: Seq[Expression] =
    Seq(condExpr, tsuExpr, idExpr, typeExpr, valueExpr)

  override def dataType: DataType = StructType(Seq(
    StructField("tsu", LongType, nullable = true),
    StructField("event_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  override def nullable: Boolean = true

  override def createAggregationBuffer(): ArgLastEventAgg.Buf =
    new ArgLastEventAgg.Buf

  override def update(buf: ArgLastEventAgg.Buf, input: InternalRow): ArgLastEventAgg.Buf = {
    val c = condExpr.eval(input)
    if (c != null && c.asInstanceOf[Boolean]) {
      val tsu = tsuExpr.eval(input)
      val id = idExpr.eval(input)
      val et = typeExpr.eval(input)
      val v = valueExpr.eval(input)
      buf.offer(tsu == null, if (tsu == null) 0L else tsu.asInstanceOf[Long],
        id == null, if (id == null) 0L else id.asInstanceOf[Long],
        if (et == null) null else et.asInstanceOf[UTF8String].copy(),
        v == null, if (v == null) 0.0 else v.asInstanceOf[Double])
    }
    buf
  }

  override def merge(a: ArgLastEventAgg.Buf, b: ArgLastEventAgg.Buf): ArgLastEventAgg.Buf = {
    if (b.has)
      a.offer(b.tsuNull, b.tsu, b.idNull, b.id, b.et, b.vNull, b.v)
    a
  }

  override def eval(buf: ArgLastEventAgg.Buf): Any =
    if (!buf.has) null
    else {
      val r = new GenericInternalRow(4)
      if (buf.tsuNull) r.setNullAt(0) else r.setLong(0, buf.tsu)
      if (buf.idNull) r.setNullAt(1) else r.setLong(1, buf.id)
      if (buf.et == null) r.setNullAt(2) else r.update(2, buf.et)
      if (buf.vNull) r.setNullAt(3) else r.setDouble(3, buf.v)
      r
    }

  override def serialize(buf: ArgLastEventAgg.Buf): Array[Byte] = {
    val etBytes =
      if (buf.et == null) null else buf.et.toString.getBytes(StandardCharsets.UTF_8)
    val n = if (etBytes == null) 0 else etBytes.length
    val bb = ByteBuffer.allocate(1 + 8 + 8 + 8 + 4 + n)
    var flags = 0
    if (buf.has) flags |= 1
    if (buf.tsuNull) flags |= 2
    if (buf.idNull) flags |= 4
    if (buf.vNull) flags |= 8
    if (etBytes == null) flags |= 16
    bb.put(flags.toByte)
    bb.putLong(buf.tsu); bb.putLong(buf.id); bb.putDouble(buf.v)
    bb.putInt(n)
    if (etBytes != null) bb.put(etBytes)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgLastEventAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val flags = bb.get()
    val buf = new ArgLastEventAgg.Buf
    val tsu = bb.getLong; val id = bb.getLong; val v = bb.getDouble
    val n = bb.getInt
    val et =
      if ((flags & 16) != 0) null
      else {
        val a = new Array[Byte](n); bb.get(a)
        UTF8String.fromBytes(a)
      }
    if ((flags & 1) != 0) {
      buf.offer((flags & 2) != 0, tsu, (flags & 4) != 0, id, et,
        (flags & 8) != 0, v)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgLastEventAgg =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): ArgLastEventAgg =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ArgLastEventAgg =
    copy(condExpr = c(0), tsuExpr = c(1), idExpr = c(2), typeExpr = c(3),
      valueExpr = c(4))

  override def prettyName: String = "arg_last_event"
}

object ArgLastEventAgg {

  /** Single-row argmax buffer. Comparison = struct ordering on
    * (tsu, event_id) with NULL smallest, matching max(struct(...)). */
  final class Buf {
    var has: Boolean = false
    var tsuNull: Boolean = false
    var tsu: Long = 0L
    var idNull: Boolean = false
    var id: Long = 0L
    var et: UTF8String = _
    var vNull: Boolean = false
    var v: Double = 0.0

    /** true when (aNull, a) > (bNull, b) under NULL-smallest long order */
    @inline private def gt(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Boolean =
      if (aNull) false else if (bNull) true else a > b

    @inline private def eq2(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Boolean =
      (aNull && bNull) || (!aNull && !bNull && a == b)

    def offer(nTsuNull: Boolean, nTsu: Long, nIdNull: Boolean, nId: Long,
              nEt: UTF8String, nVNull: Boolean, nV: Double): Unit = {
      val better = !has ||
        gt(nTsuNull, nTsu, tsuNull, tsu) ||
        (eq2(nTsuNull, nTsu, tsuNull, tsu) && gt(nIdNull, nId, idNull, id))
      if (better) {
        has = true
        tsuNull = nTsuNull; tsu = nTsu
        idNull = nIdNull; id = nId
        et = nEt
        vNull = nVNull; v = nV
      }
    }
  }
}
