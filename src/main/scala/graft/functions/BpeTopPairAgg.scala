package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_top_pair(seq, cnt)` — one BPE training round's winning pair as ONE
  * aggregate over the (cnt, seq) vocabulary.
  *
  * For each row, the single-space-separated symbol sequence `seq`
  * (trimmed) contributes `cnt` to every adjacent symbol pair; the result
  * is `STRUCT<l, r, pair_count>` for the maximal pair under
  * (pair_count DESC, l ASC, r ASC) — the exact argmax order of the
  * explode → groupBy(l, r) → orderBy → limit 1 chain it replaces
  * ([[graft.ops.TextQueries]]'s round body), with symbol comparison in
  * binary UTF8 order (what Spark's string orderBy uses). NULL when no
  * row yields a pair (every word a single symbol) — callers filter that
  * to keep the old empty-frame semantics.
  *
  * Why an aggregate: the composed round paid an explode of every symbol
  * pair, a (l, r) exchange, and a TakeOrdered job — per ROUND. The pair
  * space is vocabulary-bounded (BPE's trainability-at-100 TB property),
  * so each map task folds its word types into a pair→count hash map and
  * only #partitions maps cross the one exchange; the argmax falls out of
  * the final merge. Merge is per-pair addition — associative,
  * commutative, partition-order-free. */
case class BpeTopPairAgg(seq: Expression, cnt: Expression,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BpeTopPairAgg.Buf] {

  override def children: Seq[Expression] = Seq(seq, cnt)

  override def dataType: DataType = StructType(Seq(
    StructField("l", StringType, nullable = false),
    StructField("r", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def createAggregationBuffer(): BpeTopPairAgg.Buf =
    new BpeTopPairAgg.Buf

  override def update(buf: BpeTopPairAgg.Buf, input: InternalRow): BpeTopPairAgg.Buf = {
    val s = seq.eval(input)
    val c = cnt.eval(input)
    if (s != null && c != null) {
      val toks = s.asInstanceOf[UTF8String].trim().toString.split(" ", -1)
      val by = c.asInstanceOf[Long]
      var i = 0
      while (i < toks.length - 1) {
        buf.add(toks(i), toks(i + 1), by)
        i += 1
      }
    }
    buf
  }

  override def merge(a: BpeTopPairAgg.Buf, b: BpeTopPairAgg.Buf): BpeTopPairAgg.Buf = {
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.add(e.getKey._1, e.getKey._2, e.getValue)
    }
    a
  }

  override def eval(buf: BpeTopPairAgg.Buf): Any = {
    if (buf.map.isEmpty) return null
    var bestL: UTF8String = null
    var bestR: UTF8String = null
    var bestC = Long.MinValue
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val l = UTF8String.fromString(e.getKey._1)
      val r = UTF8String.fromString(e.getKey._2)
      val c = e.getValue.longValue
      val better = c > bestC || (c == bestC && {
        val cl = l.compareTo(bestL)
        cl < 0 || (cl == 0 && r.compareTo(bestR) < 0)
      })
      if (better) { bestL = l; bestR = r; bestC = c }
    }
    new GenericInternalRow(Array[Any](bestL, bestR, bestC))
  }

  override def serialize(buf: BpeTopPairAgg.Buf): Array[Byte] = {
    var bytes = 4
    val it0 = buf.map.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      bytes += 16 + e.getKey._1.getBytes("UTF-8").length +
        e.getKey._2.getBytes("UTF-8").length
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val lb = e.getKey._1.getBytes("UTF-8")
      val rb = e.getKey._2.getBytes("UTF-8")
      bb.putInt(lb.length); bb.put(lb)
      bb.putInt(rb.length); bb.put(rb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BpeTopPairAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BpeTopPairAgg.Buf
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val lb = new Array[Byte](bb.getInt); bb.get(lb)
      val rb = new Array[Byte](bb.getInt); bb.get(rb)
      buf.add(new String(lb, "UTF-8"), new String(rb, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BpeTopPairAgg =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): BpeTopPairAgg =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BpeTopPairAgg =
    copy(seq = c(0), cnt = c(1))

  override def prettyName: String = "bpe_top_pair"
}

object BpeTopPairAgg {
  /** (l, r) → summed count. String keys (the symbols are short and the
    * map is vocabulary-bounded); binary-UTF8 tie-breaks happen at eval. */
  final class Buf {
    val map = new java.util.HashMap[(String, String), java.lang.Long]()
    def add(l: String, r: String, by: java.lang.Long): Unit = {
      val k = (l, r)
      val cur = map.get(k)
      map.put(k, if (cur == null) by else cur + by)
    }
  }
}
