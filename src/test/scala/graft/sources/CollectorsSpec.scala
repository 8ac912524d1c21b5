package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** S11/S12/S14/S15 exec-collector parsers (FIXTURES.md §B5). */
class CollectorsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val at = lit("2024-01-01 00:00:00").cast("timestamp")
  private val host = lit("h1")

  test("kstat: headers skipped, 3-field rows only (S11)") {
    val d = Seq(
      (0L, "12 1 0x01 92 4416 8577227699 517752187756"),
      (1L, "name type data"),
      (2L, "hits 4 12345"),
      (3L, "misses 4 67"),
      (4L, "not a kstat row at all with extra")).toDF("idx", "line")
    val m = Collectors.kstat(d, at, host, "zfs.arcstats").collect()
    assert(m.map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
      == Map("zfs.arcstats.hits" -> 12345.0, "zfs.arcstats.misses" -> 67.0))
  }

  test("nvidia-smi CSV: gauges per gpu, unparseable value skipped not zeroed (S12)") {
    val d = Seq(
      "0, NVIDIA GeForce RTX 3090, 45, 1024, 24576, 33, 350",
      "1, NVIDIA A100, 60, 2048, 40960, [N/A], 400").toDF("line")
    val m = Collectors.nvidiaSmi(d, at, host).collect()
    val gpu0 = m.filter(_.getAs[String]("name").startsWith("gpu.nvidia.0."))
    assert(gpu0.length == 5)
    assert(m.find(_.getAs[String]("name") == "gpu.nvidia.0.temperature").get
      .getAs[Double]("value") == 45.0)
    // gpu 1's utilization "[N/A]" must be skipped (ref warns+skips), rest kept
    val gpu1names = m.filter(_.getAs[String]("name").startsWith("gpu.nvidia.1."))
      .map(_.getAs[String]("name")).toSet
    assert(!gpu1names.contains("gpu.nvidia.1.utilization") && gpu1names.size == 4)
    assert(m.forall(_.getAs[Map[String, String]]("tags").contains("device")))
  }

  test("nvidia-smi: fractional power.draw parses (ref ParseFloat, gpu.go:100)") {
    val d = Seq("0, NVIDIA GeForce RTX 3090, 45, 1024, 24576, 33, 38.96").toDF("line")
    val m = Collectors.nvidiaSmi(d, at, host).collect()
    assert(m.find(_.getAs[String]("name") == "gpu.nvidia.0.powerdraw").get
      .getAs[Double]("value") == 38.96)
    // the integer fields stay Atoi-strict: fractional temperature is a skip
    val d2 = Seq("0, RTX, 45.5, 1024, 24576, 33, 350").toDF("line")
    val names2 = Collectors.nvidiaSmi(d2, at, host).collect().map(_.getAs[String]("name")).toSet
    assert(!names2.contains("gpu.nvidia.0.temperature") && names2.size == 4)
  }

  test("rocm-smi JSON: gauges per card, Atoi-strict integer fields (S12)") {
    val doc = Seq(
      """{"card0": {"GUID": "34246", "Card series": "Radeon RX 7900 XTX",
        |  "Temperature (Sensor edge) (C)": "53.0",
        |  "VRAM Total Used Memory (B)": "2348810240",
        |  "VRAM Total Memory (B)": "25753026560",
        |  "GPU use (%)": "12",
        |  "Current Socket Graphics Package Power (W)": "41"},
        | "card1": {"GUID": "99999", "Card series": "Radeon VII",
        |  "Temperature (Sensor edge) (C)": "61.5",
        |  "VRAM Total Used Memory (B)": "1024",
        |  "VRAM Total Memory (B)": "17163091968",
        |  "GPU use (%)": "7",
        |  "Current Socket Graphics Package Power (W)": "38.96"}}""".stripMargin
        .replaceAll("\n", "")).toDF("value")
    val m = Collectors.rocmSmi(doc, at, host).collect()
    def v(name: String) = m.find(_.getAs[String]("name") == name)
      .map(_.getAs[Double]("value"))
    // temperature is ParseFloat — fractional OK (ref gpu.go:143)
    assert(v("gpu.amd.card0.temperature").contains(53.0))
    assert(v("gpu.amd.card1.temperature").contains(61.5))
    assert(v("gpu.amd.card0.memory.used").contains(2348810240.0))
    assert(v("gpu.amd.card0.utilization").contains(12.0))
    assert(v("gpu.amd.card0.powerdraw").contains(41.0))
    // power is Atoi in the reference (gpu.go:185) — "38.96" is a skip
    assert(v("gpu.amd.card1.powerdraw").isEmpty)
    assert(m.filter(_.getAs[String]("name").startsWith("gpu.amd.card1.")).length == 4)
    val tags0 = m.find(_.getAs[String]("name") == "gpu.amd.card0.temperature").get
      .getAs[Map[String, String]]("tags")
    assert(tags0 == Map("guid" -> "34246", "device" -> "Radeon RX 7900 XTX"))
  }

  test("apt: three gauges partitioned by security/upgradable (S14)") {
    val upgr = Seq(
      "vim/stable-security 2:9.0 amd64 [upgradable from: 2:8.2]",
      "curl/stable 8.0 amd64 [upgradable from: 7.88]",
      "wget/stable 1.21 amd64 [upgradable from: 1.20]").toDF("line")
    val inst = (1 to 10).map(i => s"pkg$i/stable 1.0 amd64 [installed]").toDF("line")
    val m = Collectors.aptPackages(upgr, inst, at, host).collect()
    def v(sec: String, upg: String) = m.find(_.getAs[Map[String, String]]("tags")
      == Map("security" -> sec, "upgradable" -> upg)).get.getAs[Double]("value")
    assert(v("false", "false") == 7.0) // 10 - 1 security - 2 upgradable
    assert(v("false", "true") == 2.0)
    assert(v("true", "true") == 1.0)
  }

  test("cgroup io.stat: multi-device rows × kv pairs, broadcast device join (S15)") {
    val devices = Seq(("253:1", "dm-1", "disk"), ("7:7", "loop7", "loop"))
      .toDF("devno", "device_name", "device_type")
    val d = Seq(
      "253:1 rbytes=3190784 wbytes=655360",
      "7:7 7:6 rbytes=1145856 wbytes=0").toDF("line")
    val m = Collectors.cgroupIoStat(d, at, host, devices,
      map(lit("cgroup_name"), lit("system.slice")))
    val rows = m.collect()
    // row 1: 1 device × 2 keys; row 2: 2 devices × 2 keys (7:6 unresolved)
    assert(rows.length == 6)
    val dm1 = rows.filter(_.getAs[Map[String, String]]("tags")("device_name") == "dm-1")
    assert(dm1.map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
      == Map("cgroup.iostat.rbytes" -> 3190784.0, "cgroup.iostat.wbytes" -> 655360.0))
    // unknown device falls back to devno + "unknown" type, not a dropped row
    assert(rows.exists(_.getAs[Map[String, String]]("tags")("device_name") == "7:6"))
    assert(rows.forall(_.getAs[Map[String, String]]("tags")("cgroup_name") == "system.slice"))
    // the dim join must be a broadcast, never a fact-side shuffle
    assert(m.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
