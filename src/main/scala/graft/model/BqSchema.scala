package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Recursive BigQuery-JSON-schema → Spark `StructType` converter.
  *
  * Re-expresses the reference's schema loader
  * (`/root/reference/dags/ethereum2etl_airflow/bigquery_utils.py:36-65`):
  * a schema file is a JSON array of `{name, type, mode, fields}` objects;
  * `RECORD` recurses, `REPEATED` wraps in an array, and the defaults are
  * type STRING / mode NULLABLE (`bigquery_utils.py:51-53,59-62`).
  *
  * Type mapping (SURVEY.md §1.2): INTEGER→Long (BQ INTEGER is int64),
  * NUMERIC→Decimal(38,9) (BQ NUMERIC semantics), FLOAT→Double,
  * TIMESTAMP→Timestamp (session TZ pinned UTC), everything else String.
  * All fields are nullable — BQ REPEATED arrays arrive as `[]` when absent,
  * matching Spark's JSON reader.
  */
object BqSchema {

  private val mapper = new ObjectMapper()

  def typeFor(bqType: String): DataType = bqType.toUpperCase match {
    case "INTEGER" | "INT64"    => LongType
    case "FLOAT" | "FLOAT64"    => DoubleType
    case "NUMERIC"              => DecimalType(38, 9)
    case "BOOLEAN" | "BOOL"     => BooleanType
    case "TIMESTAMP"            => TimestampType
    case "DATE"                 => DateType
    case "BYTES"                => BinaryType
    case _                      => StringType // default per bigquery_utils.py:51-53
  }

  private def fieldFor(node: JsonNode): StructField = {
    val name = node.path("name").asText()
    val bqType = if (node.has("type")) node.path("type").asText() else "STRING"
    val mode = if (node.has("mode")) node.path("mode").asText() else "NULLABLE"
    val leaf: DataType =
      if (bqType.equalsIgnoreCase("RECORD"))
        StructType(node.path("fields").elements().asScala.map(fieldFor).toArray)
      else typeFor(bqType)
    val dt = if (mode.equalsIgnoreCase("REPEATED")) ArrayType(leaf, containsNull = true) else leaf
    StructField(name, dt, nullable = true)
  }

  /** Parse a BigQuery schema JSON string (array of field objects). */
  def fromJson(json: String): StructType = {
    val root = mapper.readTree(json)
    require(root.isArray, "BigQuery schema file must be a JSON array of fields")
    StructType(root.elements().asScala.map(fieldFor).toArray)
  }

  /** Parse a schema file from the local filesystem. */
  def fromFile(path: String): StructType =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
