package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `term_df(tc[, min_df])` — whole-corpus document-frequency table as ONE
  * aggregate, with an optional min-df floor applied INSIDE the aggregate.
  *
  * Input is the per-document `term_counts(text)` array (terms already
  * DISTINCT per doc, so "+1 per entry" IS document frequency). Returns
  * `STRUCT<terms: ARRAY<STRING>, dfs: ARRAY<BIGINT>, n_docs: BIGINT>` with
  * the vocabulary sorted ascending in binary UTF8 order — exactly the
  * shape [[TfidfTopK]] binary-searches.
  *
  * Why an aggregate: the composed form — explode → groupBy(term) → global
  * array collect — pays TWO exchanges (term partial/final, then the 1-row
  * collect) and materializes a vocabulary-sized row stream in between.
  * This runs as ObjectHashAggregate partial/final: each map task folds its
  * documents into a term→df hash map (vocabulary-bounded, NOT
  * corpus-bounded), and only #partitions serialized maps cross the one
  * exchange. Merge is per-term addition — associative and commutative, so
  * the result is partition-order independent.
  *
  * Keys live as UTF8String through the whole life of the buffer and the
  * final sort uses UTF8String.compareTo (byte order) — Java String
  * ordering differs on non-BMP codepoints, and the consumer's binary
  * search must agree with the sort bit-for-bit.
  *
  * A null input array (null text upstream) contributes nothing — not even
  * to n_docs — matching `COUNT(*) ... WHERE text IS NOT NULL`.
  *
  * `minDf` is the scale valve: raw web-scale vocabularies grow with the
  * corpus (the Heaps-law typo tail is the MAJORITY of distinct terms), and
  * this aggregate's result rides to the driver as one scalar and then to
  * every scoring task — the one place in the plan that cannot degrade
  * gracefully. The floor runs at FINAL eval (a term's total df is unknown
  * until the partials merge, so it cannot run earlier), which is exactly
  * where it must: partial maps stay partition-bounded, while the
  * materialized scalar drops every term with `df < minDf` — at web scale
  * `min_df = 2` alone removes the hapax tail, the majority of the
  * vocabulary. `minDf = 1` (the default) keeps every term: bit-identical
  * to the unfloored aggregate. `n_docs` counts ALL documents regardless of
  * the floor — IDF denominators of surviving terms must not shift. */
case class TermDfAgg(tc: Expression, minDf: Long = 1L,
                     override val mutableAggBufferOffset: Int = 0,
                     override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TermDfAgg.Buf] {

  override def children: Seq[Expression] = Seq(tc)

  override def dataType: DataType = StructType(Seq(
    StructField("terms", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("dfs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n_docs", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TermDfAgg.Buf = new TermDfAgg.Buf

  override def update(buf: TermDfAgg.Buf, input: InternalRow): TermDfAgg.Buf = {
    val v = tc.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val e = arr.getStruct(i, 2)
        if (e != null && !e.isNullAt(0)) buf.add(e.getUTF8String(0), 1L)
        i += 1
      }
      buf.nDocs += 1L
    }
    buf
  }

  override def merge(a: TermDfAgg.Buf, b: TermDfAgg.Buf): TermDfAgg.Buf = {
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.add(e.getKey, e.getValue)
    }
    a.nDocs += b.nDocs
    a
  }

  override def eval(buf: TermDfAgg.Buf): Any = {
    // the min-df floor runs here — the one point where total df is known
    // and BEFORE the result leaves the aggregate as a driver scalar
    val all = new Array[UTF8String](buf.map.size)
    buf.map.keySet().toArray(all)
    val keys =
      if (minDf <= 1L) all
      else all.filter(k => buf.map.get(k).longValue >= minDf)
    java.util.Arrays.sort(keys, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    val dfs = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) { dfs(i) = buf.map.get(keys(i)).longValue; i += 1 }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(keys.asInstanceOf[Array[Any]]),
      new GenericArrayData(dfs), buf.nDocs))
  }

  override def serialize(buf: TermDfAgg.Buf): Array[Byte] = {
    var bytes = 16
    val it0 = buf.map.entrySet().iterator()
    while (it0.hasNext) bytes += 12 + it0.next().getKey.numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(buf.nDocs)
    bb.putInt(buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TermDfAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TermDfAgg.Buf
    buf.nDocs = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.add(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TermDfAgg =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): TermDfAgg =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TermDfAgg =
    copy(tc = c(0))

  override def prettyName: String = "term_df"
}

object TermDfAgg {
  /** term → df hash map plus the doc counter. UTF8String keys arriving
    * from unsafe buffers are copied on first insert (fromBytes) so the
    * buffer never aliases a reused scan page. */
  final class Buf {
    val map = new java.util.HashMap[UTF8String, java.lang.Long]()
    var nDocs = 0L

    def add(term: UTF8String, by: java.lang.Long): Unit = {
      val cur = map.get(term)
      if (cur == null) map.put(UTF8String.fromBytes(term.getBytes), by)
      else map.put(term, cur + by)
    }
  }
}
