package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_low63(str)` — 63-bit integer hash of a string, bit-identical to
  * DuckDB's `md5_number_lower(str) % 9223372036854775807` (the digest's
  * last 8 bytes little-endian, reduced into the non-negative BIGINT range
  * with unsigned semantics).
  *
  * Why it exists: MinHash signatures built as `min(md5(...))` over hex
  * STRINGS force Catalyst into SortAggregate (immutable agg buffer type) —
  * the shingle stream gets fully sorted twice per signature — and the band
  * keys then carry 32-char strings across every LSH shuffle. `min(BIGINT)`
  * hash-aggregates with map-side partials and moves 8 bytes per hash: the
  * shape that survives 100 TB of shingles. The modulus keeps the value
  * reproducible in oracle SQL without UBIGINT/BIGINT overflow on either
  * engine.
  */
case class Md5Low63(child: Expression) extends UnaryExpression {
  // input typing enforced by the registry builder (Cast to STRING) —
  // ExpectsInputTypes/AbstractDataType are sql-private in Spark 4

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    Md5Low63.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Low63.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Low63 =
    copy(child = newChild)

  override def prettyName: String = "md5_low63"
}

/** `md5_high63(str)` — the OTHER 8 bytes of the same digest
  * (`md5_number_upper(str) % (2^63-1)` in DuckDB). One md5 yields two
  * independent 63-bit hash lanes, so a k-lane MinHash signature needs
  * ⌈k/2⌉ digests instead of k — half the hashing and half the seeded-string
  * concat allocations on the hot shingle stream. */
case class Md5High63(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    Md5Low63.computeUpper(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Low63.computeUpper($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5High63 =
    copy(child = newChild)

  override def prettyName: String = "md5_high63"
}

object Md5Low63 {
  val M: Long = Long.MaxValue // 2^63 - 1

  /** Per-thread digest + one-entry memo of the LAST (input, digest).
    * `md5_low63(x)` and `md5_high63(x)` of the same value evaluate
    * back-to-back in the same generated row loop, so the memo halves the
    * digest work when both lanes of one seeded string are used. Keyed by
    * byte CONTENT (Arrays.equals), so it is correctness-neutral no matter
    * how the planner orders the calls. */
  private final class Hasher {
    val md = java.security.MessageDigest.getInstance("MD5")
    var lastInput: Array[Byte] = null
    var lastDigest: Array[Byte] = null
    def digest(b: Array[Byte]): Array[Byte] = {
      if (lastInput == null || !java.util.Arrays.equals(lastInput, b)) {
        // defensive copy: UTF8String.getBytes can return the BACKING array
        // un-copied; memoizing that live reference would return a stale
        // digest if a reader mutates the buffer in place between calls
        lastInput = java.util.Arrays.copyOf(b, b.length)
        lastDigest = md.digest(b)
      }
      lastDigest
    }
  }

  private val tlMd5 = ThreadLocal.withInitial[Hasher](() => new Hasher)

  /** The per-thread raw digest instance, for callers that stream MANY
    * digests per row ([[ShingleSig]]) — one MessageDigest per thread for
    * the whole md5 family instead of one per call site. */
  def threadMd5: java.security.MessageDigest = tlMd5.get().md

  // The DuckDB md5_number lane math lives HERE and only here (ADVICE r5:
  // ShingleSig had byte-for-byte copies that could silently diverge).
  /** Digest bytes 8..15 read little-endian — DuckDB's `md5_number_lower`. */
  def low64(d: Array[Byte]): Long = {
    var base = 0L
    var i = 15
    while (i >= 8) { base = (base << 8) | (d(i) & 0xffL); i -= 1 }
    base
  }

  /** Digest bytes 0..7 read little-endian — DuckDB's `md5_number_upper`. */
  def high64(d: Array[Byte]): Long = {
    var base = 0L
    var i = 7
    while (i >= 0) { base = (base << 8) | (d(i) & 0xffL); i -= 1 }
    base
  }

  /** `md5_number_lower % (2^63-1)` with unsigned remainder — in [0, 2^63-1). */
  def loLane(d: Array[Byte]): Long = java.lang.Long.remainderUnsigned(low64(d), M)

  /** `md5_number_upper % (2^63-1)` (verified byte-for-byte against DuckDB). */
  def hiLane(d: Array[Byte]): Long = java.lang.Long.remainderUnsigned(high64(d), M)

  /** Static (callable from generated Java): md5_number_lower(s) % (2^63-1). */
  def compute(s: UTF8String): Long = loLane(tlMd5.get().digest(s.getBytes))

  /** md5_number_upper(s) % (2^63-1). */
  def computeUpper(s: UTF8String): Long = hiLane(tlMd5.get().digest(s.getBytes))
}
