package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sketch(token, k)` — native k-permutation MinHash aggregate.
  *
  * The SQL-composable form ([[graft.ops.DedupQueries]] `q_minhash_sig`:
  * `min(md5(concat(seed, sh)))` × k) re-hashes every token k times with a
  * cryptographic hash and carries k separate aggregate expressions; fine
  * for the 4-hash oracle demo, but a production 128-permutation signature
  * over 100 TB of shingles wants ONE aggregate walking the tokens once —
  * the `TypedImperativeAggregate` slot SURVEY.md §4.2 reserves for the
  * north-star sketches.
  *
  * Buffer = `Array[Long](k)` of current minima. Per token, one xxhash64
  * base hash; the k "permutations" derive from it as
  * `h_i = base * A_i + B_i` (the standard linear-permutation family —
  * universal-hash mixing, no per-permutation re-hash of the bytes; A odd so
  * the map is a bijection on Z_2^64). Update is k fused multiply-adds per
  * token; merge is the element-wise min, so map-side partial aggregation
  * does the heavy lifting and only `k` longs per group cross the shuffle —
  * the same partial/final shape Catalyst gives built-in aggregates.
  *
  * Estimate Jaccard(a, b) as `array size of (sig_a ∩_position sig_b) / k`
  * (fraction of positions where the signatures agree).
  */
case class MinHashSketch(child: Expression, k: Int, mode: String = "xxhash64",
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(k >= 1 && k <= 1024, s"minhash_sketch k must be in [1, 1024], got $k")
  require(mode == "xxhash64" || mode == "md5p",
    s"minhash_sketch mode must be 'xxhash64' or 'md5p', got '$mode'")

  private val md5Mode = mode == "md5p"

  // input typing enforced by the registry builder (Cast to STRING) —
  // ExpectsInputTypes/AbstractDataType are sql-private in Spark 4
  override def children: Seq[Expression] = Seq(child)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      if (md5Mode) {
        // DuckDB-reproducible family: base = md5_number_lower(token)
        // (little-endian of digest bytes 8..15), permutations are modular
        // linear maps over Z_p (p = 2^31-1) — products stay inside signed
        // 64-bit range on both engines, no wrap-around semantics needed.
        val bmod = MinHashSketch.md5BaseModP(s)
        var i = 0
        while (i < k) {
          val h = (MinHashSketch.mulA(i) * bmod + MinHashSketch.incB(i)) % MinHashSketch.P
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      } else {
        val base = XxHash64Function.hash(s, StringType, 42L)
        var i = 0
        while (i < k) {
          // odd multiplier => bijective mixing per permutation
          val h = base * MinHashSketch.oddA(i) + MinHashSketch.addB(i)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSketch =
    copy(child = c.head)

  override def prettyName: String = "minhash_sketch"
}

object MinHashSketch {
  /** Deterministic permutation constants (splitmix64 stream — public-domain
    * constants; same values on driver and every executor). */
  private val consts: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(2048) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }
  def oddA(i: Int): Long = consts(2 * i) | 1L
  def addB(i: Int): Long = consts(2 * i + 1)

  /** `md5p` mode: Mersenne prime modulus — (p-1)^2 + p < 2^63, so the
    * permutation arithmetic never overflows signed 64-bit (DuckDB BIGINT
    * errors on overflow; Java would silently wrap — the modular family
    * sidesteps both). */
  val P: Long = 2147483647L // 2^31 - 1
  /** multiplier in [1, p-1], increment in [0, p-1] — same splitmix stream as
    * the xxhash64 family; the oracle SQL interpolates the identical values. */
  def mulA(i: Int): Long = Math.floorMod(consts(2 * i), P - 1) + 1
  def incB(i: Int): Long = Math.floorMod(consts(2 * i + 1), P)

  private val modPermCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  /** (A, B) md5p permutation constants for lanes 0..k-1, materialized once
    * per k — the per-shingle lane loop ([[ShingleSig.computeK]]) reads
    * plain arrays instead of recomputing floorMod per lane per token. */
  def modPerms(k: Int): (Array[Long], Array[Long]) =
    modPermCache.computeIfAbsent(k,
      { n => (Array.tabulate(n)(mulA), Array.tabulate(n)(incB)) })

  /** `md5_number_lower(token) % p` exactly as DuckDB computes it: the
    * digest's last 8 bytes read little-endian as an unsigned 64-bit int
    * ([[Md5Low63.low64]] — the one home of the byte-lane semantics),
    * reduced mod p with unsigned semantics. Uses [[Md5Low63.threadMd5]] —
    * the md5 family's single per-thread digest — rather than a second
    * ThreadLocal of its own. */
  def md5BaseModP(s: UTF8String): Long =
    java.lang.Long.remainderUnsigned(
      Md5Low63.low64(Md5Low63.threadMd5.digest(s.getBytes)), P)
}
