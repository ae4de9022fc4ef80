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

object Md5Low63 {
  val M: Long = Long.MaxValue // 2^63 - 1

  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static (callable from generated Java): md5_number_lower(s) % (2^63-1)
    * with unsigned remainder — always in [0, 2^63-1). */
  def compute(s: UTF8String): Long = {
    val d = tlMd5.get().digest(s.getBytes)
    var base = 0L
    var i = 15
    while (i >= 8) { base = (base << 8) | (d(i) & 0xffL); i -= 1 }
    java.lang.Long.remainderUnsigned(base, M)
  }
}
