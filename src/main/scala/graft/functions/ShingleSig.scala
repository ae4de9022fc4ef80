package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_sig(text)` — the document's complete 4-lane MinHash signature
  * `struct(mh0, mh1, mh2, mh3)` as ONE native per-row expression;
  * `shingle_sig_set(text)` additionally carries `ss`, the sorted distinct
  * band-0 shingle-hash set (what `collect_set(h0)` produced).
  *
  * Semantics are bit-identical to the composed pipeline these replace (and
  * to the unchanged DuckDB oracles in [[graft.ops.DedupQueries]]):
  * `w = split(trim(text), '\s+')` (ASCII-space-only trim, Java
  * `Pattern.split` limit -1 — same empty-token corner cases as
  * [[SimHash16]]), docs with fewer than 3 tokens are NULL (the composed
  * form's `size(w) >= 3` filter), 3-word shingles `w[i] ' ' w[i+1] ' '
  * w[i+2]`, lanes `mh0/mh1 = md5_low63/md5_high63('0:' || sh)` and
  * `mh2/mh3` the same over `'1:' || sh`, each lane MIN'd over the
  * shingle stream.
  *
  * Why an expression: the composed form exploded one row per shingle and
  * aggregated `min()` back by `groupBy(doc_id)` — but `doc_id` is UNIQUE
  * per input row, so that exchange shuffled the corpus to regroup rows
  * that were never apart: pure overhead, at any scale. The loop here does
  * the identical digests and mins inside the scan — the signature stage of
  * q_minhash_sig / q_lsh_pairs / q_jaccard_pairs / q_dedup_clusters /
  * q_corpus_keep drops from one full exchange to zero. (The
  * [[MinHashSketch]] AGGREGATE remains the right tool when tokens arrive
  * pre-exploded — e.g. a token table — where the grouping key genuinely
  * scatters across rows.)
  */
case class ShingleSig(child: Expression) extends UnaryExpression {
  // input typing enforced by the registry builder (Cast to STRING) —
  // ExpectsInputTypes/AbstractDataType are sql-private in Spark 4

  override def dataType: DataType = ShingleSig.sigType

  override def nullable: Boolean = true // docs under 3 tokens are null

  override def nullSafeEval(t: Any): Any =
    ShingleSig.compute(t.asInstanceOf[UTF8String], false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ShingleSig.compute($c, false);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleSig =
    copy(child = newChild)

  override def prettyName: String = "shingle_sig"
}

/** See [[ShingleSig]] — same lanes plus the sorted distinct band-0 hash set
  * (`ss`), for consumers that verify Jaccard on the candidates. */
case class ShingleSigSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ShingleSig.sigSetType

  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    ShingleSig.compute(t.asInstanceOf[UTF8String], true)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ShingleSig.compute($c, true);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleSigSet =
    copy(child = newChild)

  override def prettyName: String = "shingle_sig_set"
}

/** `shingle_set(text)` — ONLY the sorted distinct band-0 shingle-hash set
  * (the `ss` field of [[ShingleSigSet]]), bit-identical values, at HALF
  * the digest cost: `ss` needs just the `'0:' || sh` digest, while the
  * 4-lane struct also digests `'1:' || sh` for mh2/mh3. Built (r18) for
  * q_simjoin_prefix standalone — the exact prefix-filter join never
  * reads the MinHash lanes, so the second digest per shingle was pure
  * waste there (~half the 0.54 s tokenize stage at sf0.1). Consumers
  * that need lanes AND set in one pass (q_lsh_recall's shared scan)
  * keep shingle_sig_set. Equality of this set to shingle_sig_set's `ss`
  * on the real corpus is spec-pinned (ShingleSigSpec), chaining it to
  * the proven oracle path. */
case class ShingleSetOnly(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // docs under 3 tokens are null

  override def nullSafeEval(t: Any): Any =
    ShingleSig.computeSet(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ShingleSig.computeSet($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleSetOnly =
    copy(child = newChild)

  override def prettyName: String = "shingle_set"
}

/** `shingle_minhash(text, k)` — the k-permutation md5p MinHash signature
  * (the [[MinHashSketch]] `md5p` family: base = `md5_number_lower(sh) % P`,
  * lanes = modular linear permutations over Z_{2^31-1}) computed over the
  * document's 3-word shingles as ONE per-row expression.
  *
  * Same motivation as [[ShingleSig]] (r5) applied to the 64-perm
  * production signature: the aggregate form exploded one row per shingle
  * and regrouped by `doc_id` — a key UNIQUE per input row, so that
  * exchange re-colocated rows that were never apart. The
  * [[MinHashSketch]] AGGREGATE remains the right tool for genuinely
  * pre-exploded token streams; equality of the two paths on the real
  * corpus is spec-proven (ShingleSigSpec), which chains the aggregate to
  * the q_minhash_native oracle. */
case class ShingleMinHash(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1 && k <= 1024, s"shingle_minhash k must be in [1, 1024], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // docs under 3 tokens are null

  override def nullSafeEval(t: Any): Any =
    ShingleSig.computeK(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ShingleSig.computeK($c, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)

  override def prettyName: String = "shingle_minhash"
}

/** `word_grams(text, n)` — the sorted distinct `md5_number_lower % (2^63-1)`
  * hashes of the document's n-word grams, as ONE per-row codegen'd
  * expression. Built for benchmark decontamination (q_decontaminate, n=13 —
  * the published GPT-2/GPT-3-style overlap window): the composed
  * `transform(sequence(...), i -> concat_ws(' ', slice(w, i, n)))` form
  * runs interpreted (higher-order functions have no codegen) and measured
  * ~3× slower at sf0.1. Case-folding is the caller's business — pass
  * `lower(text)` to match a case-insensitive oracle. Null when the text
  * has fewer than n whitespace tokens, like the other shingle expressions. */
case class WordGramSet(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 256, s"word_grams n must be in [1, 256], got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // docs under n tokens are null

  override def nullSafeEval(t: Any): Any =
    ShingleSig.computeGrams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ShingleSig.computeGrams($c, $n);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordGramSet =
    copy(child = newChild)

  override def prettyName: String = "word_grams"
}

/** `word_grams_pos(text, n)` — ALL `md5_number_lower % (2^63-1)` hashes of
  * the document's n-word grams IN POSITION ORDER (no sort, no distinct):
  * element i is the hash of tokens [i, i+n), so `posexplode` recovers
  * (start-token-index, gram-hash) pairs for free. Built for
  * cross-document exact-substring dedup (q_substr_dedup, the removal half
  * of Lee et al. 2022 that q_repeated_spans only measures): removal needs
  * to know WHERE each duplicated gram sits, which the sorted-distinct
  * [[WordGramSet]] deliberately discards. Same tokenizer, digest, and
  * null-under-n-tokens contract as word_grams; case-folding is the
  * caller's business. */
case class WordGramsPos(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 256, s"word_grams_pos n must be in [1, 256], got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // docs under n tokens are null

  override def nullSafeEval(t: Any): Any =
    ShingleSig.computeGramsPos(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ShingleSig.computeGramsPos($c, $n);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordGramsPos =
    copy(child = newChild)

  override def prettyName: String = "word_grams_pos"
}

/** `repetition_stats(text)` — the integer counts behind the Gopher-style
  * repetition signals (q_repetition), in ONE hash pass over the token
  * stream: token count, distinct-token count, highest token frequency,
  * distinct-bigram count. The composed form needed O(distinct × n)
  * interpreted string comparisons per row for the top-token count — fine
  * at 60 tokens/doc, quadratic pain at real document lengths. Fractions
  * are left to the caller's SQL so the floating-point math stays
  * bit-identical with the DuckDB oracle. Case-folding is the caller's
  * business (pass `lower(text)`). */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ShingleSig.repetitionType

  override def nullable: Boolean = true // null text only

  override def nullSafeEval(t: Any): Any =
    ShingleSig.computeRepetition(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ShingleSig.computeRepetition($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object ShingleSig {

  val sigType: StructType = StructType(Seq(
    StructField("mh0", LongType, nullable = false),
    StructField("mh1", LongType, nullable = false),
    StructField("mh2", LongType, nullable = false),
    StructField("mh3", LongType, nullable = false)))

  val sigSetType: StructType = StructType(sigType.fields :+
    StructField("ss", ArrayType(LongType, containsNull = false), nullable = false))

  /** ASCII-space trim + `\s+` split, limit -1 — the one tokenizer every
    * per-row signature expression shares (same corner cases as the
    * composed `split(trim(text))` form and the oracle CTEs). */
  private def tokensOf(t: UTF8String): Array[String] = {
    val str = t.toString
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    str.substring(b, e).split("\\s+", -1)
  }

  /** Static (callable from generated Java): the k-permutation md5p MinHash
    * signature over 3-word shingles — per shingle one digest, base =
    * `md5_number_lower % P` (unsigned), lane j = `(A_j·base + B_j) % P`
    * MIN'd over the stream ([[MinHashSketch]]'s exact md5p arithmetic).
    * Null when the text has fewer than 3 whitespace tokens. */
  def computeK(t: UTF8String, k: Int): GenericArrayData = {
    val words = tokensOf(t)
    val ns = words.length - 2
    if (ns <= 0) return null
    val md = Md5Low63.threadMd5
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val p = MinHashSketch.P
    val (ma, mb) = MinHashSketch.modPerms(k)
    var i = 0
    while (i < ns) {
      val sh = words(i) + " " + words(i + 1) + " " + words(i + 2)
      md.reset()
      val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val base = java.lang.Long.remainderUnsigned(Md5Low63.low64(d), p)
      var j = 0
      while (j < k) {
        val h = (ma(j) * base + mb(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Static (callable from generated Java): the 4-lane signature, plus the
    * sorted distinct band-0 hash set when `withSet`. Null when the text has
    * fewer than 3 whitespace tokens (the composed form's filter). */
  def compute(t: UTF8String, withSet: Boolean): InternalRow = {
    val words = tokensOf(t)
    val ns = words.length - 2
    if (ns <= 0) return null

    // digest instance and lane math shared with the md5_low63/md5_high63
    // expressions — Md5Low63 is the single home of the DuckDB md5_number
    // byte-lane semantics (ADVICE r5)
    val md = Md5Low63.threadMd5
    var mh0, mh1, mh2, mh3 = Long.MaxValue
    val set = if (withSet) new Array[Long](ns) else null
    var i = 0
    while (i < ns) {
      val sh = words(i) + " " + words(i + 1) + " " + words(i + 2)
      md.reset()
      val d0 = md.digest(("0:" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h0 = Md5Low63.loLane(d0)
      val h1 = Md5Low63.hiLane(d0)
      md.reset()
      val d1 = md.digest(("1:" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h2 = Md5Low63.loLane(d1)
      val h3 = Md5Low63.hiLane(d1)
      if (h0 < mh0) mh0 = h0
      if (h1 < mh1) mh1 = h1
      if (h2 < mh2) mh2 = h2
      if (h3 < mh3) mh3 = h3
      if (withSet) set(i) = h0
      i += 1
    }
    if (!withSet)
      return InternalRow(mh0, mh1, mh2, mh3)
    // distinct ascending — the per-doc dedup collect_set did, determinized
    java.util.Arrays.sort(set)
    var out = 1
    i = 1
    while (i < ns) {
      if (set(i) != set(out - 1)) { set(out) = set(i); out += 1 }
      i += 1
    }
    InternalRow(mh0, mh1, mh2, mh3,
      new GenericArrayData(java.util.Arrays.copyOf(set, out)))
  }

  /** Static (callable from generated Java): the sorted distinct band-0
    * hash set alone — one `'0:' || sh` digest per shingle, skipping the
    * `'1:'` digest the 4-lane [[compute]] also pays. Values bit-identical
    * to [[compute]]'s `ss` field. */
  def computeSet(t: UTF8String): GenericArrayData = {
    val words = tokensOf(t)
    val ns = words.length - 2
    if (ns <= 0) return null
    val md = Md5Low63.threadMd5
    val set = new Array[Long](ns)
    var i = 0
    while (i < ns) {
      val sh = words(i) + " " + words(i + 1) + " " + words(i + 2)
      md.reset()
      val d0 = md.digest(("0:" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      set(i) = Md5Low63.loLane(d0)
      i += 1
    }
    java.util.Arrays.sort(set)
    var out = 1
    i = 1
    while (i < ns) {
      if (set(i) != set(out - 1)) { set(out) = set(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(set, out))
  }

  /** Static (callable from generated Java): sorted distinct
    * `md5_number_lower % (2^63-1)` hashes of the n-word grams — the
    * [[Md5Low63]] lane math, one digest per gram. Null when the text has
    * fewer than n whitespace tokens. */
  def computeGrams(t: UTF8String, n: Int): GenericArrayData = {
    val words = tokensOf(t)
    val ns = words.length - (n - 1)
    if (ns <= 0) return null
    val md = Md5Low63.threadMd5
    val hs = new Array[Long](ns)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ns) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hs(i) = Md5Low63.loLane(d)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var out = 1
    i = 1
    while (i < ns) {
      if (hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** Static (callable from generated Java): [[computeGrams]] without the
    * sort/dedup tail — all n-gram hashes in token-position order, so
    * element i hashes tokens [i, i+n). */
  def computeGramsPos(t: UTF8String, n: Int): GenericArrayData = {
    val words = tokensOf(t)
    val ns = words.length - (n - 1)
    if (ns <= 0) return null
    val md = Md5Low63.threadMd5
    val hs = new Array[Long](ns)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ns) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hs(i) = Md5Low63.loLane(d)
      i += 1
    }
    new GenericArrayData(hs)
  }

  val repetitionType: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false),
    StructField("n_bigrams_distinct", IntegerType, nullable = false)))

  /** Static (callable from generated Java): token / distinct-token /
    * top-frequency / distinct-bigram counts in one hash pass. */
  def computeRepetition(t: UTF8String): InternalRow = {
    val words = tokensOf(t)
    val n = words.length
    val counts = new java.util.HashMap[String, Integer](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(words(i), Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > top) top = c.intValue
      i += 1
    }
    var nbd = 0
    if (n >= 2) {
      val bg = new java.util.HashSet[String]((n - 1) * 2)
      i = 0
      while (i < n - 1) {
        if (bg.add(words(i) + " " + words(i + 1))) nbd += 1
        i += 1
      }
    }
    InternalRow(n, counts.size, top, nbd)
  }
}
