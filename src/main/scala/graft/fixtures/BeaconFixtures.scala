package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.LocalDate

import graft.model.BeaconFunctions

/** Synthetic beacon-chain fixtures: a contiguous slot range for one UTC day
  * (including `skipped=true` rows — the blocks_count invariant depends on
  * skipped slots emitting rows, SURVEY.md §5.1), matching committees and a
  * validator snapshot. Written as JSONL — the pipeline's exchange format. */
object BeaconFixtures {

  /** JSONL lines for blocks covering slots [0, n) of the genesis day.
    * Every 7th slot is a skipped slot (null roots, skipped=true). */
  def blockLines(n: Int): Seq[String] = (0 until n).map { slot =>
    val ts = BeaconFunctions.GenesisTime.plusSeconds(slot * BeaconFunctions.SecondsPerSlot)
    val epoch = slot / 32
    if (slot % 7 == 3)
      s"""{"block_slot":$slot,"block_epoch":$epoch,"block_timestamp":"$ts","skipped":true}"""
    else
      s"""{"block_slot":$slot,"block_epoch":$epoch,"block_timestamp":"$ts","proposer_index":${slot % 11},"skipped":false,"block_root":"0xb$slot","parent_root":"0xb${slot - 1}","state_root":"0xs$slot","graffiti":"0x677261667400","eth1_deposit_count":${slot * 2},"signature":"0xsig$slot","attestations":[{"aggregation_bits":"0xff","slot":${math.max(0, slot - 1)},"index":0,"beacon_block_root":"0xb${math.max(0, slot - 1)}","source_epoch":${math.max(0, epoch - 1)},"source_root":"0xcp${math.max(0, epoch - 1)}","target_epoch":$epoch,"target_root":"0xcp$epoch","signature":"0xas$slot"},{"aggregation_bits":"0x0f","slot":${math.max(0, slot - 1)},"index":1,"beacon_block_root":"0xb${math.max(0, slot - 1)}","source_epoch":${math.max(0, epoch - 1)},"source_root":"0xcp${math.max(0, epoch - 1)}","target_epoch":$epoch,"target_root":"0xcp$epoch","signature":"0xas${slot}b"}],"deposits":[{"pubkey":"0xpk$slot","withdrawal_credentials":"0xwc$slot","amount":32000000000,"signature":"0xds$slot"}],"proposer_slashings":[],"attester_slashings":${if (slot % 13 == 5) s"""[{"attestation_1_attesting_indices":[1,2,3],"attestation_1_slot":${slot - 1},"attestation_1_index":0,"attestation_2_attesting_indices":[2,3,4],"attestation_2_slot":${slot - 1},"attestation_2_index":0}]""" else "[]"},"voluntary_exits":[]}"""
  }

  /** Committees for epochs [0, nEpochs): one row per (epoch, slot, index). */
  def committeeLines(nEpochs: Int): Seq[String] =
    for {
      epoch <- 0 until nEpochs
      slotInEpoch <- 0 until 4
      idx <- 0 until 2
    } yield {
      val slot = epoch * 32 + slotInEpoch
      val ts = BeaconFunctions.GenesisTime.plusSeconds(epoch * 32 * BeaconFunctions.SecondsPerSlot)
      val members = (0 until 3).map(m => slot + m * 7).mkString("[", ",", "]")
      s"""{"epoch":$epoch,"epoch_timestamp":"$ts","slot":$slot,"index":$idx,"committee":$members}"""
    }

  /** Validator snapshots for epochs [0, nEpochs) × nValidators validators;
    * exercises the STRING uint64 epochs incl. the FAR_FUTURE sentinel.
    * `epochSpacingSeconds` spreads snapshot timestamps (default = real epoch
    * cadence; pass 3600 to land successive epochs in distinct hours). */
  def validatorLines(nEpochs: Int, nValidators: Int,
                     epochSpacingSeconds: Long = 32 * BeaconFunctions.SecondsPerSlot): Seq[String] =
    for {
      epoch <- 0 until nEpochs
      v <- 0 until nValidators
    } yield {
      val ts = BeaconFunctions.GenesisTime.plusSeconds(epoch * epochSpacingSeconds)
      val exitEpoch = if (v % 3 == 0) BeaconFunctions.FarFutureEpoch else s"${100 + v}"
      s"""{"epoch":$epoch,"timestamp":"$ts","pubkey":"0xv$v","validator_index":$v,"balance":"32000000000.5","withdrawal_credentials":"0xwc$v","effective_balance":"32000000000","slashed":${v % 5 == 0},"activation_eligibility_epoch":"0","activation_epoch":"$v","exit_epoch":"$exitEpoch","withdrawable_epoch":"$exitEpoch","status":"${if (v % 5 == 0) "exited_slashed" else "active_ongoing"}"}"""
    }

  val GenesisDay: LocalDate = LocalDate.parse("2020-12-01")

  /** Write a full fixture day (blocks/committees/validators JSONL) into
    * `dir`, matching JsonlBeaconSource's expected filenames. */
  def writeDay(dir: String, nSlots: Int = 128, nValidators: Int = 10): Unit = {
    val nEpochs = nSlots / 32
    write(s"$dir/beacon_blocks.json", blockLines(nSlots))
    write(s"$dir/beacon_committees.json", committeeLines(nEpochs))
    write(s"$dir/beacon_validators.json", validatorLines(nEpochs, nValidators))
  }

  def write(path: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }
}
