package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Text-analysis operators over the `documents` table: token counting,
  * quality signals, language-ID heuristic, document fingerprinting, and the
  * multimodal binary-column metadata pass.
  *
  * Everything is per-row `functions._` work — embarrassingly parallel, stays
  * inside whole-stage codegen, no shuffle except where an aggregate is the
  * point. That is the property that makes these ops run at 100 TB: the cost
  * is one pass over the column, partition-local.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "an", "of", "to", "and")
  private val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens + a BPE-ish lowercase-run count.
    "q_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).as("n_alpha_runs"),
        length(col("text")).as("len_chars"),
        col("n_chars"))),

    // Quality signals: length ratios + stopword ratio (higher-order filter
    // keeps the stoplist check codegen'd; no UDF).
    "q_text_quality" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          split(trim(col("text")), "\\s+").as("w"))
        .select(
          col("doc_id"),
          length(col("text")).as("len_chars"),
          size(col("w")).as("n_tokens"),
          expr(s"size(filter(w, x -> x IN ($stopList)))").as("n_stop"),
          (length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
            length(col("text"))).as("char_density"),
          (length(col("text")).cast("double") / size(col("w")))
            .as("avg_token_len"))),

    // Language-ID heuristic: English-stopword vote (the data's `lang` label
    // is random; the guess column is the operator under test).
    "q_lang_guess" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          split(trim(col("text")), "\\s+").as("w"))
        .select(col("doc_id"), col("lang"),
          expr(s"size(filter(w, x -> x IN ($stopList)))").as("en_votes"))
        .withColumn("guess",
          when(col("en_votes") >= 2, "en").otherwise("other"))),

    // Document fingerprint: md5 over whitespace-normalized lowercase text.
    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"))),

    // Multimodal metadata pass: text treated as an opaque payload — byte
    // length + content hash, the same schema shape used for image/audio
    // binary columns (see graft.ops.Multimodal for the binary pipeline).
    "q_multimodal_meta" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text")).as("content_hash"),
        col("n_chars")))
  )

  val oracle: Map[String, String] = Map(
    "q_token_count" ->
      """SELECT doc_id,
                len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_runs,
                length(text) AS len_chars, n_chars
         FROM documents""",
    "q_text_quality" ->
      s"""SELECT doc_id, length(text) AS len_chars,
                 len(w) AS n_tokens,
                 len(list_filter(w, x -> x IN ($stopList))) AS n_stop,
                 CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                   / length(text) AS char_density,
                 CAST(length(text) AS DOUBLE) / len(w) AS avg_token_len
          FROM (SELECT doc_id, text,
                       string_split_regex(trim(text), '\\s+') AS w
                FROM documents) t""",
    "q_lang_guess" ->
      s"""SELECT doc_id, lang, en_votes,
                 CASE WHEN en_votes >= 2 THEN 'en' ELSE 'other' END AS guess
          FROM (SELECT doc_id, lang,
                       len(list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x IN ($stopList))) AS en_votes
                FROM documents) t""",
    "q_fingerprint" ->
      """SELECT doc_id,
                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
         FROM documents""",
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                md5(text) AS content_hash, n_chars
         FROM documents"""
  )
}
