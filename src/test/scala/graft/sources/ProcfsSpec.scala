package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** B5 collector-format parsers (FIXTURES.md §B5; SURVEY.md §2.1). */
class ProcfsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val at = lit("2024-01-01 00:00:00").cast("timestamp")
  private val host = lit("h1")

  test("cpu: per-cpu counters + ctxt, aggregate cpu line skipped (S1)") {
    val stat = Seq(
      "cpu  100 200 300 400 500 600 700 0 0 0",
      "cpu0 10 20 30 40 50 60 70 0 0 0",
      "cpu1 11 21 31 41 51 61 71 0 0 0",
      "ctxt 123456",
      "btime 1700000000").toDF("line")
    val m = Procfs.cpu(stat, at, host).collect()
    assert(m.length == 15) // 2 cpus × 7 keys + ctxt
    val u0 = m.find(r => r.getAs[String]("name") == "cpu.user" &&
      r.getAs[Map[String, String]]("tags") == Map("cpu" -> "0")).get
    assert(u0.getAs[Double]("value") == 10.0)
    assert(m.find(_.getAs[String]("name") == "cpu.ctxt").get.getAs[Double]("value") == 123456.0)
    assert(m.forall(_.getAs[String]("type") == "counter"))
  }

  test("loadavg + uptime gauges (S3/S4)") {
    val l = Procfs.loadavg(Seq("0.52 0.58 0.59 1/389 12345").toDF("line"), at, host)
      .collect()
    assert(l.map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
      == Map("load.1" -> 0.52, "load.5" -> 0.58, "load.15" -> 0.59))
    val u = Procfs.uptime(Seq("35435.97 270503.19").toDF("line"), at, host).collect()
    assert(u.head.getAs[Double]("value") == 35435.97)
  }

  test("meminfo: osstat-derived memory gauges in bytes (S2)") {
    val lines = Seq(
      "MemTotal:       16316684 kB",
      "MemFree:         4186628 kB",
      "MemAvailable:   10724160 kB",
      "Buffers:          517344 kB",
      "Cached:          5875428 kB",
      "SwapCached:            0 kB",
      "Active:          5713276 kB",
      "SReclaimable:     545260 kB").toDF("line")
    val m = Procfs.meminfo(lines, at, host).collect()
    val byName = m.map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
    val k = 1024.0
    assert(byName("memory.total") == 16316684 * k)
    assert(byName("memory.free") == 4186628 * k)
    assert(byName("memory.available") == 10724160 * k)
    // cached = Cached + SReclaimable; used = total - free - buffers - cached
    assert(byName("memory.cached") == (5875428 + 545260) * k)
    assert(byName("memory.used") ==
      (16316684 - 4186628 - 517344 - 5875428 - 545260) * k)
    assert(m.forall(_.getAs[String]("type") == "gauge") && m.length == 5)
  }

  test("diskstats: 17 counters per device, loop skipped (S5)") {
    val d = Seq(
      "   8       0 sda 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17",
      "   7       0 loop0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17").toDF("line")
    val m = Procfs.diskstats(d, at, host).collect()
    assert(m.length == 17)
    assert(m.forall(_.getAs[Map[String, String]]("tags") == Map("device" -> "sda")))
    assert(m.find(_.getAs[String]("name") == "disk.reads_completed").get
      .getAs[Double]("value") == 1.0)
    assert(m.find(_.getAs[String]("name") == "disk.time_spent_flushing").get
      .getAs[Double]("value") == 17.0)
  }

  test("net/dev: rx/tx bytes+packets, veth/br- skipped (S7)") {
    val d = Seq(
      "Inter-|   Receive                                                |  Transmit",
      " face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed",
      "  eth0: 1000 10 0 0 0 0 0 0 2000 20 0 0 0 0 0 0",
      " veth1: 1 1 0 0 0 0 0 0 1 1 0 0 0 0 0 0").toDF("line")
    val m = Procfs.netDev(d, at, host).collect()
    assert(m.length == 4)
    assert(m.map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
      == Map("net.rx.bytes" -> 1000.0, "net.rx.packets" -> 10.0,
        "net.tx.bytes" -> 2000.0, "net.tx.packets" -> 20.0))
  }

  test("kv counters: vmstat-style, junk value → 0 (S8/T5)") {
    val m = Procfs.kvCounters(
      Seq("pgpgin 12345", "pgpgout junk", "nr_free_pages 999").toDF("line"),
      at, host, "vmstat").collect()
    assert(m.map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
      == Map("vmstat.pgpgin" -> 12345.0, "vmstat.pgpgout" -> 0.0,
        "vmstat.nr_free_pages" -> 999.0))
  }

  test("netstat: header/value pairing by section (S9)") {
    val d = Seq(
      (0L, "TcpExt: SyncookiesSent SyncookiesRecv"),
      (1L, "TcpExt: 5 7"),
      (2L, "IpExt: InNoRoutes InTruncatedPkts"),
      (3L, "IpExt: 1 2")).toDF("idx", "line")
    val m = Procfs.netstat(d, at, host).collect()
    assert(m.map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
      == Map("TcpExt.SyncookiesSent" -> 5.0, "TcpExt.SyncookiesRecv" -> 7.0,
        "IpExt.InNoRoutes" -> 1.0, "IpExt.InTruncatedPkts" -> 2.0))
  }

  test("df output: free/used gauges, pseudo-fs skipped (S6)") {
    val d = Seq(
      "Filesystem     Mounted on Type  File  Inodes IFree IUsed IUse% 1K-blocks Avail Used Use%",
      "/dev/sda1      /          ext4  -     100    90    10    10%   1000      800   200  20%",
      "tmpfs          /tmp       tmpfs -     1      1     0     0%    10        10    0    0%").toDF("line")
    val m = Procfs.dfOutput(d, at, host).collect()
    assert(m.length == 2)
    assert(m.map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
      == Map("disk.free" -> 800.0, "disk.used" -> 200.0))
    assert(m.forall(_.getAs[Map[String, String]]("tags")
      == Map("path" -> "/dev/sda1", "mount" -> "/", "type" -> "ext4")))
  }

  test("sensors -j: nested JSON → normalized gauges (S10/T6)") {
    val json = """{"coretemp-isa-0000":{"Core 0":{"temp2_input":45.0,"temp2_max":100.0}}}"""
    val m = Procfs.sensorsJson(Seq(json).toDF("value"), at, host).collect()
    assert(m.length == 2)
    val t = m.find(_.getAs[String]("name") == "sensors.temp2_input").get
    assert(t.getAs[Double]("value") == 45.0)
    assert(t.getAs[Map[String, String]]("tags")
      == Map("chip" -> "coretemp-isa-0000", "feature" -> "core_0"))
  }
}
