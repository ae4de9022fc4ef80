package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / resize / frame-sample as per-partition
  * batch transforms.
  *
  * Design for 100 TB (the part under test here):
  * - the payload is a single BinaryType column; metadata is a typed struct —
  *   schema-on-read never touches the bytes;
  * - heavy per-row work runs in `mapPartitions` over iterator *batches*
  *   (the Scala analog of `mapInPandas` batch shape): one library init per
  *   partition, vectorizable inner loop, no per-row driver round-trips;
  * - decode itself is STUBBED deterministically (no image/audio libs in
  *   this container) behind [[Decoder]]; the partitioning, schema, batch
  *   shape and column plumbing are real and tested.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = true),   // image|audio|video
    StructField("format", StringType, nullable = true),       // png|wav|mp4|…
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val recordSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", metaSchema, nullable = true)))

  /** Decoded-feature schema produced by the extract pass. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** The pluggable decode seam. Production would bind an image/audio codec;
    * the deterministic stub derives a fake feature vector from payload bytes
    * so tests have exact expectations. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake: feature i = byte at stride positions, normalized.
    * Stands in for a real codec (marked stub by design — see object docs). */
  object StubDecoder extends Decoder {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload == null || payload.isEmpty) return out
      var i = 0
      while (i < dim) {
        out(i) = (payload(i % payload.length) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Feature extraction over payload batches: one `mapPartitions` pass,
    * decoder initialized once per partition (the expensive-library-init
    * pattern), rows processed in a tight loop. */
  def extractFeatures(df: DataFrame, dim: Int = 8,
                      decoder: Decoder = StubDecoder): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    df.select("media_id", "payload").mapPartitions { it =>
      // per-partition init happens HERE (decoder warm-up, codec contexts)
      val d = decoder
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val hash = java.security.MessageDigest.getInstance("MD5")
          .digest(payload).map("%02x".format(_)).mkString
        Row(id, payload.length, hash, d.decode(payload, dim).toSeq)
      }
    }(enc)
  }

  /** "Resize" stub: truncate/pad the payload to `targetBytes` — the real
    * implementation would re-encode pixels; the plumbing (binary in,
    * binary out, partition-local) is identical. */
  def resizePayload(df: DataFrame, targetBytes: Int): DataFrame =
    df.withColumn("payload",
      when(col("payload").isNull, col("payload"))
        .otherwise(expr(s"substring(payload, 1, $targetBytes)")))

  /** Frame sampling for video-like payloads: every k-th chunk of the binary,
    * exploded one row per sampled frame — shape matches a real frame
    * extractor (row multiplication, ordinal column, bounded chunk size). */
  def sampleFrames(df: DataFrame, frameBytes: Int, everyK: Int): DataFrame =
    df.select(col("media_id"),
        posexplode(expr(
          s"""CASE WHEN payload IS NULL OR length(payload) < $frameBytes
              THEN CAST(array() AS ARRAY<BINARY>)
              ELSE filter(transform(sequence(0, int(length(payload) / $frameBytes) - 1),
                i -> IF(i % $everyK = 0, substring(payload, i * $frameBytes + 1, $frameBytes),
                        CAST(NULL AS BINARY))), x -> x IS NOT NULL) END""")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")

  /** Build a multimodal DataFrame from the documents table (text bytes as
    * the opaque payload) — the fixture generator for tests and the
    * registered query. */
  def fromDocuments(spark: SparkSession, dir: String): DataFrame =
    graft.tables.Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image").as("media_type"), lit("fake").as("format"),
        lit(64).cast("int").as("width"), lit(64).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))
}
