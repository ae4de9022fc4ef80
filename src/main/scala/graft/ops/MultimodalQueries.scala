package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered query forms of the multimodal pipeline ([[Multimodal]]),
  * using the documents table's text bytes as the opaque payload.
  *
  * q_multimodal_decode runs the full mapPartitions batch path with the
  * deterministic stub decoder, so even the fake "decoded" feature vectors
  * hash-match the DuckDB oracle (f32 arithmetic on both sides).
  * q_frame_sample is the video-shaped row-multiplying pass; its frame
  * digests run over hex(frame) so the DuckDB twin (VARCHAR-only md5) is
  * byte-exact.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Features are presented as a scaled-integer JSON string: raw float
    // arrays crash the driver's pandas sorter and float→string formatting
    // differs across engines; floor(x*1e6) on the identical IEEE float is
    // exact both sides.
    "q_multimodal_decode" -> ((s, d) =>
      Multimodal.extractFeatures(Multimodal.fromDocuments(s, d), dim = 4)
        .withColumn("features", to_json(expr(
          "transform(features, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")))),

    // The frame digest runs over hex(frame) rather than the raw bytes:
    // DuckDB's md5/substring only accept VARCHAR, and a 16-BYTE frame can
    // split a multi-byte UTF-8 character — hex is the byte-exact encoding
    // both engines can slice and hash identically (ord(substr(text,...))
    // char indexing diverged on non-ASCII payloads).
    "q_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.fromDocuments(s, d),
          frameBytes = 16, everyK = 2)
        .select(col("media_id"), col("frame_no"),
          length(col("frame")).as("frame_bytes"),
          md5(hex(col("frame"))).as("frame_hash")))
  )

  val oracle: Map[String, String] = Map(
    // BYTE-based like the Spark StubDecoder (hex(encode(...)) indexes UTF-8
    // payload bytes, not characters — ord(substr(...)) diverged on
    // non-ASCII text) and NULL text coalesces to the empty payload on both
    // sides (Spark: null payload → zero features + md5 of empty).
    "q_multimodal_decode" ->
      """SELECT doc_id AS media_id,
                CAST(octet_length(encode(coalesce(text, ''))) AS INT) AS n_bytes,
                md5(coalesce(text, '')) AS content_hash,
                CAST(to_json(list_transform(range(4), i ->
                  CAST(floor(CAST(
                    CAST(CASE WHEN octet_length(encode(coalesce(text, ''))) = 0 THEN 0
                              ELSE CAST(concat('0x', substr(hex(encode(text)),
                                     CAST((i % octet_length(encode(text))) * 2 + 1 AS INT), 2)) AS INT)
                         END AS FLOAT) / CAST(255 AS FLOAT)
                  AS DOUBLE) * 1000000) AS BIGINT))) AS VARCHAR) AS features
         FROM documents""",
    "q_frame_sample" ->
      """WITH h AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
                           octet_length(encode(text)) AS nb
                    FROM documents),
           chunks AS (
             SELECT media_id, CAST(i AS INT) AS i,
                    substr(hx, CAST(i * 32 + 1 AS INT), 32) AS fhx
             FROM h, UNNEST(range(nb // 16)) t(i)
             WHERE i % 2 = 0 AND nb >= 16)
         SELECT media_id, CAST(i // 2 AS INT) AS frame_no,
                CAST(length(fhx) // 2 AS INT) AS frame_bytes,
                md5(fhx) AS frame_hash
         FROM chunks"""
  )
}
