package graft.jobs

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

class PipelineConfigSpec extends AnyFunSuite {

  import PipelineConfig._

  test("prefix lookup falls back to unprefixed names (E7)") {
    val v = fromMap("eth2_mainnet_", Map(
      "eth2_mainnet_output_bucket" -> "b1", "export_max_workers" -> "7"))
    assert(v.required("output_bucket") === "b1")
    assert(v.int("export_max_workers", 5) === 7)
  }

  test("required var missing throws with the prefixed name") {
    val v = fromMap("eth2_mainnet_", Map.empty)
    val e = intercept[IllegalArgumentException](v.required("output_bucket"))
    assert(e.getMessage.contains("eth2_mainnet_output_bucket"))
  }

  test("export config coerces dates/ints/lists with reference defaults") {
    val cfg = readExportConfig(fromMap("p_", Map(
      "p_provider_uris" -> "http://a, http://b",
      "p_output_bucket" -> "bkt",
      "p_export_start_date" -> "2021-01-05")))
    assert(cfg.providerUris === Seq("http://a", "http://b"))
    assert(cfg.exportStartDate === LocalDate.parse("2021-01-05"))
    assert(cfg.exportMaxWorkers === 5) // reference default, README.md:71
    assert(cfg.exportEndDate.isEmpty)
  }

  test("load catchup flips on iff an end date is set (build_load_dag.py:60)") {
    val base = Map("p_output_bucket" -> "b", "p_destination_dataset_project_id" -> "proj")
    assert(!readLoadConfig(fromMap("p_", base)).loadCatchup)
    assert(readLoadConfig(fromMap("p_", base + ("p_load_end_date" -> "2020-12-02"))).loadCatchup)
  }
}
