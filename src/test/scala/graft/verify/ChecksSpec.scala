package graft.verify

import org.apache.spark.sql.functions._

import graft.{BeaconFixtures, SparkTestBase}
import graft.io.BeaconIO

/** Verify-stage golden tests (SURVEY.md §5.2 item 3): the four reference
  * checks pass on a clean fixture day and fail with the reference's exact
  * message strings on mutated fixtures. */
class ChecksSpec extends SparkTestBase {

  private val ds = "2020-12-01"

  private def register(nSlots: Int = 128,
                       mutateBlocks: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
    val dir = tmpDir("checks")
    BeaconFixtures.writeDay(dir, nSlots)
    mutateBlocks(BeaconIO.readBeaconTable(spark, "beacon_blocks", s"$dir/beacon_blocks.json"))
      .createOrReplaceTempView("beacon_blocks")
    BeaconIO.readBeaconTable(spark, "beacon_committees", s"$dir/beacon_committees.json")
      .createOrReplaceTempView("beacon_committees")
    BeaconIO.readBeaconTable(spark, "beacon_validators", s"$dir/beacon_validators.json")
      .createOrReplaceTempView("beacon_validators")
  }

  test("all checks pass on a complete fixture day") {
    register()
    Checks.runAll(spark, ds, includeValidators = true)
  }

  test("rendered-SQL form of every check passes too (B14 templating)") {
    register()
    for (c <- Seq("blocks_count", "blocks_have_latest", "committees_count", "validators_count"))
      spark.sql(Checks.renderedSql(c, ds)).collect()
  }

  test("a dropped slot fails blocks_count with the reference message") {
    register(mutateBlocks = _.filter(col("block_slot") =!= 77))
    val e = intercept[Exception](Checks.blocksCount(spark, ds))
    assert(e.getMessage.contains(
      s"Total number of beacon blocks is not equal to last block number plus one on $ds"))
  }

  test("an empty day fails blocks_have_latest with the reference message") {
    register(mutateBlocks = _.filter(to_date(col("block_timestamp")) =!= ds))
    val e = intercept[Exception](Checks.blocksHaveLatest(spark, ds))
    assert(e.getMessage.contains(s"There are no blocks on $ds"))
  }

  test("a missing epoch fails committees_count with the reference message") {
    val dir = tmpDir("checks-missing-epoch")
    BeaconFixtures.writeDay(dir, 128)
    BeaconIO.readBeaconTable(spark, "beacon_blocks", s"$dir/beacon_blocks.json")
      .createOrReplaceTempView("beacon_blocks")
    BeaconIO.readBeaconTable(spark, "beacon_committees", s"$dir/beacon_committees.json")
      .filter(col("epoch") =!= 1)
      .createOrReplaceTempView("beacon_committees")
    val e = intercept[Exception](Checks.committeesCount(spark, ds))
    assert(e.getMessage.contains(
      s"Total number of epochs in beacon committees is not equal to last epoch plus one on $ds"))
  }

  test("a duplicated-but-gappy epoch set fails validators_count") {
    val dir = tmpDir("checks-validators")
    BeaconFixtures.writeDay(dir, 128)
    BeaconIO.readBeaconTable(spark, "beacon_validators", s"$dir/beacon_validators.json")
      .withColumn("epoch", when(col("epoch") === 2, 9L).otherwise(col("epoch")))
      .createOrReplaceTempView("beacon_validators")
    val e = intercept[Exception](Checks.validatorsCount(spark, ds))
    assert(e.getMessage.contains(
      s"Total number of epochs in beacon validators is not equal to last epoch plus one on $ds"))
  }

  test("rendered SQL throws under ANSI assert when the invariant is violated (B11)") {
    register(mutateBlocks = _.filter(col("block_slot") =!= 50))
    val e = intercept[Exception](spark.sql(Checks.renderedSql("blocks_count", ds)).collect())
    assert(e.getMessage.contains("Total number of beacon blocks"))
  }
}
