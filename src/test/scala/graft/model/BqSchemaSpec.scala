package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** A14 round-trip: the recursive BQ-JSON-schema converter applied to the
  * three reference schema files must equal the hand-declared StructTypes
  * (the engine's source of truth). */
class BqSchemaSpec extends AnyFunSuite {

  private val schemaDir =
    "/root/reference/dags/ethereum2etl_resources/stages/load/schemas"

  test("beacon_blocks.json converts to the declared schema") {
    assert(BqSchema.fromFile(s"$schemaDir/beacon_blocks.json") ===
      BeaconSchemas.beaconBlocks)
  }

  test("beacon_validators.json converts to the declared schema") {
    assert(BqSchema.fromFile(s"$schemaDir/beacon_validators.json") ===
      BeaconSchemas.beaconValidators)
  }

  test("beacon_committees.json converts to the declared schema") {
    assert(BqSchema.fromFile(s"$schemaDir/beacon_committees.json") ===
      BeaconSchemas.beaconCommittees)
  }

  test("defaults: missing type is STRING, missing mode is NULLABLE") {
    val st = BqSchema.fromJson("""[{"name": "x"}]""")
    assert(st === StructType(Seq(StructField("x", StringType, nullable = true))))
  }

  test("REPEATED RECORD nests arrays of structs; NUMERIC is Decimal(38,9)") {
    val st = BqSchema.fromJson(
      """[{"name": "r", "type": "RECORD", "mode": "REPEATED",
          "fields": [{"name": "n", "type": "NUMERIC"},
                     {"name": "ids", "type": "INTEGER", "mode": "REPEATED"}]}]""")
    val inner = StructType(Seq(
      StructField("n", DecimalType(38, 9), nullable = true),
      StructField("ids", ArrayType(LongType, containsNull = true), nullable = true)))
    assert(st === StructType(Seq(
      StructField("r", ArrayType(inner, containsNull = true), nullable = true))))
  }
}
