package graft.model

import org.apache.spark.sql.types._

/** Hand-declared schemas for the three beacon tables — the engine's source
  * of truth, ported field-by-field from the reference schema files under
  * `/root/reference/dags/ethereum2etl_resources/stages/load/schemas/`
  * (`beacon_blocks.json`, `beacon_validators.json`, `beacon_committees.json`).
  *
  * Faithful-reproduction quirks kept on purpose (SURVEY.md §1.2):
  * - `proposer_slashings.header_*_{parent,state,body}_root` / `_signature`
  *   are declared FLOAT in the reference (`beacon_blocks.json:168-214`)
  *   although they hold hex strings — we mirror with DoubleType;
  * - validator `activation_*`/`exit_*`/`withdrawable_epoch` are STRING
  *   uint64s (`beacon_validators.json:43-61`) because the FAR_FUTURE_EPOCH
  *   sentinel 18446744073709551615 overflows int64 — compare via
  *   `cast(col as decimal(20,0))` ([[BeaconFunctions.epochU64]]);
  * - `balance`/`effective_balance` are BQ NUMERIC → Decimal(38,9).
  */
object BeaconSchemas {

  private def f(n: String, t: DataType) = StructField(n, t, nullable = true)
  private def arr(s: StructType) = ArrayType(s, containsNull = true)

  val attestation: StructType = StructType(Seq(
    f("aggregation_bits", StringType),
    f("slot", LongType),
    f("index", LongType),
    f("beacon_block_root", StringType),
    f("source_epoch", LongType),
    f("source_root", StringType),
    f("target_epoch", LongType),
    f("target_root", StringType),
    f("signature", StringType)))

  val deposit: StructType = StructType(Seq(
    f("pubkey", StringType),
    f("withdrawal_credentials", StringType),
    f("amount", LongType),
    f("signature", StringType)))

  val proposerSlashing: StructType = StructType(Seq(
    f("header_1_slot", LongType),
    f("header_1_proposer_index", LongType),
    f("header_1_parent_root", DoubleType),
    f("header_1_state_root", DoubleType),
    f("header_1_body_root", DoubleType),
    f("header_1_signature", DoubleType),
    f("header_2_slot", LongType),
    f("header_2_proposer_index", LongType),
    f("header_2_parent_root", DoubleType),
    f("header_2_state_root", DoubleType),
    f("header_2_body_root", DoubleType),
    f("header_2_signature", DoubleType)))

  val attesterSlashing: StructType = StructType(Seq(
    f("attestation_1_attesting_indices", ArrayType(LongType, containsNull = true)),
    f("attestation_1_slot", LongType),
    f("attestation_1_index", LongType),
    f("attestation_1_beacon_block_root", StringType),
    f("attestation_1_source_epoch", LongType),
    f("attestation_1_source_root", StringType),
    f("attestation_1_target_epoch", LongType),
    f("attestation_1_target_root", StringType),
    f("attestation_1_signature", StringType),
    f("attestation_2_attesting_indices", ArrayType(LongType, containsNull = true)),
    f("attestation_2_slot", LongType),
    f("attestation_2_index", LongType),
    f("attestation_2_beacon_block_root", StringType),
    f("attestation_2_source_epoch", LongType),
    f("attestation_2_source_root", StringType),
    f("attestation_2_target_epoch", LongType),
    f("attestation_2_target_root", StringType),
    f("attestation_2_signature", StringType)))

  val voluntaryExit: StructType = StructType(Seq(
    f("epoch", LongType),
    f("validator_index", LongType),
    f("signature", StringType)))

  val beaconBlocks: StructType = StructType(Seq(
    f("block_slot", LongType),
    f("block_epoch", LongType),
    f("block_timestamp", TimestampType),
    f("proposer_index", LongType),
    f("skipped", BooleanType),
    f("block_root", StringType),
    f("parent_root", StringType),
    f("state_root", StringType),
    f("randao_reveal", StringType),
    f("graffiti", StringType),
    f("eth1_block_hash", StringType),
    f("eth1_deposit_root", StringType),
    f("eth1_deposit_count", LongType),
    f("signature", StringType),
    f("attestations", arr(attestation)),
    f("deposits", arr(deposit)),
    f("proposer_slashings", arr(proposerSlashing)),
    f("attester_slashings", arr(attesterSlashing)),
    f("voluntary_exits", arr(voluntaryExit))))

  val beaconValidators: StructType = StructType(Seq(
    f("epoch", LongType),
    f("timestamp", TimestampType),
    f("pubkey", StringType),
    f("validator_index", LongType),
    f("balance", DecimalType(38, 9)),
    f("withdrawal_credentials", StringType),
    f("effective_balance", DecimalType(38, 9)),
    f("slashed", BooleanType),
    f("activation_eligibility_epoch", StringType),
    f("activation_epoch", StringType),
    f("exit_epoch", StringType),
    f("withdrawable_epoch", StringType),
    f("status", StringType)))

  val beaconCommittees: StructType = StructType(Seq(
    f("epoch", LongType),
    f("epoch_timestamp", TimestampType),
    f("slot", LongType),
    f("index", LongType),
    f("committee", ArrayType(LongType, containsNull = true))))

  /** table name → (schema, partition-source timestamp column), mirroring the
    * reference's TimePartitioning fields
    * (`/root/reference/dags/ethereum2etl_airflow/build_load_dag.py:126-128`). */
  val tables: Map[String, (StructType, String)] = Map(
    "beacon_blocks"     -> ((beaconBlocks, "block_timestamp")),
    "beacon_validators" -> ((beaconValidators, "timestamp")),
    "beacon_committees" -> ((beaconCommittees, "epoch_timestamp")))
}
