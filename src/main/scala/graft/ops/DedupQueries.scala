package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Deduplication operators over the `documents` table — the LLM-pipeline
  * surface: exact dedup, MinHash signatures, banded-LSH candidate pairs,
  * n-gram Jaccard verification, and SimHash.
  *
  * Scale design (the part that matters at 100 TB):
  * - exact dedup is a hash groupBy on the content key — one shuffle,
  *   map-side partial aggregation;
  * - near-dup never goes all-pairs: MinHash signatures are per-row work,
  *   candidate generation is an equi-join on (band, hash-value) — each
  *   bucket joins only within itself;
  * - Jaccard verification runs only on LSH candidates, joined back to
  *   shingle sets by (doc, shingle) equi-keys.
  *
  * Hash function: md5 (shared verbatim by the DuckDB oracle, so signatures
  * are byte-identical cross-engine). In a hot production path you'd swap in
  * `xxhash64` — same plan shape, cheaper hash.
  */
object DedupQueries {

  /** doc_id + word array (docs shorter than one 3-shingle are dropped —
    * mirrors `len(w) >= 3` in the oracle). */
  private def words(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)

  /** Exploded 3-word shingles: `transform` over an index sequence keeps the
    * shingle build inside whole-stage codegen (no UDF). */
  private def shingles(s: SparkSession, d: String): DataFrame =
    words(s, d).select(
      col("doc_id"),
      explode(expr(
        """transform(sequence(1, size(w) - 2),
           i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ',
                       element_at(w, i + 2)))""")).as("sh"))

  /** 4-hash MinHash signature per doc (seeded by prefixing the hash input).
    * Built from the RAW shingle stream, not a pre-distinct'd set: min() is
    * dedup-insensitive and partial-aggregates map-side, so the whole
    * signature costs one narrow shuffle of 4 hashes per doc — measurably
    * faster than forcing a distinct shuffle of every (doc, shingle) first. */
  private def minhashSig(s: SparkSession, d: String): DataFrame =
    shingles(s, d).groupBy("doc_id").agg(
      min(md5(concat(lit("0:"), col("sh")))).as("mh0"),
      min(md5(concat(lit("1:"), col("sh")))).as("mh1"),
      min(md5(concat(lit("2:"), col("sh")))).as("mh2"),
      min(md5(concat(lit("3:"), col("sh")))).as("mh3"))

  /** Banded-LSH candidate pairs: bands of 1 hash each; bucket equi-join,
    * `doc_a < doc_b` dedups the symmetric pair. */
  private def lshPairs(s: SparkSession, d: String): DataFrame = {
    val bands = minhashSig(s, d).selectExpr(
      "doc_id", "stack(4, 0, mh0, 1, mh1, 2, mh2, 3, mh3) AS (band, h)")
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.band").as("band"))
      .groupBy("doc_a", "doc_b")
      .agg(countDistinct(col("band")).as("shared_bands"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C15 / exact dedup: hash-groupBy on the exact content key.
    "q_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))),

    "q_minhash_sig" -> ((s, d) => minhashSig(s, d)),

    // Production-grade signature: ONE native TypedImperativeAggregate
    // ([[graft.functions.MinHashSketch]]) walks the shingle stream once and
    // emits a 64-permutation signature — vs 64 separate min(md5(...))
    // aggregate columns. No oracle (xxhash64 + linear permutations are not
    // reproducible in DuckDB SQL; driver records rows-only) — the
    // sketch's statistical behavior is spec-tested in MinHashSketchSpec
    // and the 4-hash md5 variant above stays the oracle-checked twin.
    // The signature serializes to JSON (integer contents — engine-neutral):
    // a raw array column crashes the driver's pandas sorter even for the
    // rows-only check.
    "q_minhash_native" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      shingles(s, d).groupBy("doc_id")
        .agg(to_json(expr("minhash_sketch(sh, 64)")).as("sig"))
    }),

    "q_lsh_pairs" -> ((s, d) => lshPairs(s, d)),

    // n-gram Jaccard, verified only on LSH candidates (never all-pairs).
    // The intersection join carries the shingle IN the equi-key
    // ((doc_b, sh) both sides) — keying on doc_b alone would fan out
    // |sh(a)|×|sh(b)| rows per pair before filtering, a plan that dies at
    // scale (and measurably thrashed this bench at sf0.1).
    "q_jaccard_pairs" -> ((s, d) => {
      val ssh = shingles(s, d).distinct()
      val cnt = ssh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val cand = lshPairs(s, d).select("doc_a", "doc_b")
      val inter = cand
        .join(ssh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(ssh.select(col("doc_id").as("doc_b"), col("sh")),
          Seq("doc_b", "sh"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("ni"))
      inter
        .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("ni"),
          (col("ni").cast("double") / (col("na") + col("nb") - col("ni")))
            .as("jaccard"))
    }),

    // 16-bit SimHash from per-word md5 bit votes (integer-only arithmetic →
    // bit-identical to the oracle).
    "q_simhash" -> ((s, d) => {
      val w = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      val bits = w
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(1), lit(16))).as("i"))
        .withColumn("bit",
          expr("(instr('0123456789abcdef', substring(md5(w), i, 1)) - 1) % 2"))
      bits
        .groupBy("doc_id", "i")
        .agg(sum(when(col("bit") === 1, 1).otherwise(-1)).as("sgn"))
        .groupBy("doc_id")
        .agg(sum(when(col("sgn") >= 0,
            expr("CAST(shiftleft(1, i - 1) AS BIGINT)"))
          .otherwise(0L)).as("simhash"))
    })
  )

  private val shingleCte =
    """ws AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents),
       sh AS (SELECT doc_id,
                     UNNEST(list_transform(generate_series(1, len(w) - 2),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
              FROM ws WHERE len(w) >= 3),
       sig AS (SELECT doc_id,
                      MIN(md5('0:' || sh)) AS mh0, MIN(md5('1:' || sh)) AS mh1,
                      MIN(md5('2:' || sh)) AS mh2, MIN(md5('3:' || sh)) AS mh3
               FROM sh GROUP BY doc_id),
       bands AS (SELECT doc_id, 0 AS band, mh0 AS h FROM sig
                 UNION ALL SELECT doc_id, 1, mh1 FROM sig
                 UNION ALL SELECT doc_id, 2, mh2 FROM sig
                 UNION ALL SELECT doc_id, 3, mh3 FROM sig),
       pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        COUNT(DISTINCT a.band) AS shared_bands
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)"""

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
         FROM documents GROUP BY text""",
    "q_minhash_sig" ->
      s"""WITH $shingleCte
          SELECT doc_id, mh0, mh1, mh2, mh3 FROM sig""",
    "q_lsh_pairs" ->
      s"""WITH $shingleCte
          SELECT doc_a, doc_b, shared_bands FROM pairs""",
    "q_jaccard_pairs" ->
      s"""WITH $shingleCte,
          ssh AS (SELECT DISTINCT doc_id, sh FROM sh),
          cnt AS (SELECT doc_id, COUNT(*) AS n FROM ssh GROUP BY doc_id),
          inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS ni
                    FROM pairs p
                    JOIN ssh a ON a.doc_id = p.doc_a
                    JOIN ssh b ON b.doc_id = p.doc_b AND b.sh = a.sh
                    GROUP BY 1, 2)
          SELECT i.doc_a, i.doc_b, i.ni,
                 CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) AS jaccard
          FROM inter i
          JOIN cnt ca ON ca.doc_id = i.doc_a
          JOIN cnt cb ON cb.doc_id = i.doc_b""",
    "q_simhash" ->
      """WITH w AS (SELECT doc_id,
                           UNNEST(string_split_regex(trim(text), '\s+')) AS w
                    FROM documents),
          bits AS (SELECT doc_id, t.i,
                          (strpos('0123456789abcdef',
                             substr(md5(w), CAST(t.i AS INT), 1)) - 1) % 2 AS bit
                   FROM w CROSS JOIN range(1, 17) t(i)),
          sgns AS (SELECT doc_id, i,
                          SUM(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS sgn
                   FROM bits GROUP BY doc_id, i)
          SELECT doc_id,
                 CAST(SUM(CASE WHEN sgn >= 0
                               THEN CAST(1 AS BIGINT) << CAST(i - 1 AS INT)
                               ELSE 0 END) AS BIGINT) AS simhash
          FROM sgns GROUP BY doc_id"""
  )
}
