package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered query forms of the multimodal pipeline ([[Multimodal]]),
  * using the documents table's text bytes as the opaque payload.
  *
  * q_multimodal_decode runs the full mapPartitions batch path with the
  * deterministic stub decoder, so even the fake "decoded" feature vectors
  * hash-match the DuckDB oracle (f32 arithmetic on both sides).
  * q_frame_sample is the video-shaped row-multiplying pass (rows-only
  * check: binary frame payloads are engine-side plumbing).
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

    "q_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.fromDocuments(s, d),
          frameBytes = 16, everyK = 2)
        .select(col("media_id"), col("frame_no"),
          length(col("frame")).as("frame_bytes"), md5(col("frame")).as("frame_hash")))
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_decode" ->
      """SELECT doc_id AS media_id,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                md5(text) AS content_hash,
                CAST(to_json(list_transform(range(4), i ->
                  CAST(floor(CAST(
                    CAST(CASE WHEN length(text) = 0 THEN 0
                              ELSE ord(substr(text, CAST(i % length(text) AS INT) + 1, 1))
                         END AS FLOAT) / CAST(255 AS FLOAT)
                  AS DOUBLE) * 1000000) AS BIGINT))) AS VARCHAR) AS features
         FROM documents""",
    "q_frame_sample" ->
      """WITH chunks AS (
           SELECT doc_id AS media_id, CAST(i AS INT) AS i,
                  substring(text, CAST(i * 16 + 1 AS INT), 16) AS frame
           FROM documents, UNNEST(range(octet_length(encode(text)) // 16)) t(i)
           WHERE i % 2 = 0 AND octet_length(encode(text)) >= 16)
         SELECT media_id, CAST(i // 2 AS INT) AS frame_no,
                CAST(octet_length(encode(frame)) AS INT) AS frame_bytes,
                md5(frame) AS frame_hash
         FROM chunks"""
  )
}
