package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, MapType, StringType}
import graft.operators.Enrich

/** Host-collector parsers (SURVEY.md §2.1, S1-S13): each turns captured
  * procfs/exec text — one row per line, a `line` column — into canonical
  * metric rows (time, type, host, name, value, tags). In production these
  * run inside a periodic `foreachBatch` over freshly captured samples; in
  * tests over FIXTURES.md §B5 samples. All parsing is split/regexp/explode
  * column work — codegen'd, no UDFs, distributes over any number of hosts'
  * samples at once.
  *
  * Number parsing follows the reference: unparseable → 0
  * (ref: util/strings.go:18-32, via [[Enrich.parseNumber]]).
  */
object Procfs {

  private def metricRow(time: Column, mtype: String, host: Column, name: Column,
      value: Column, tags: Column): Seq[Column] = Seq(
    time.as("time"), lit(mtype).as("type"), host.as("host"), name.as("name"),
    value.cast(DoubleType).as("value"), tags.as("tags"))

  private val noTags = map().cast(MapType(StringType, StringType, valueContainsNull = false))

  private def fields(c: Column): Column = Enrich.splitFields(c)

  /** S1 — `/proc/stat`: per-cpu counters `cpu.{user,nice,system,idle,iowait,
    * irq,softirq}` tagged `{cpu:id}`, plus `cpu.ctxt`
    * (ref: collector/cpu.go:14-46).
    */
  def cpu(lines: DataFrame, time: Column, host: Column): DataFrame = {
    val keys = Seq("user", "nice", "system", "idle", "iowait", "irq", "softirq")
    val f = fields(col("line"))
    val percpu = lines
      .filter(col("line").rlike("^cpu\\d+ "))
      .select(substring(f.getItem(0), 4, 10).as("id"),
        posexplode(slice(f, 2, keys.size)).as(Seq("i", "v")))
      .select(metricRow(time, "counter", host,
        concat(lit("cpu."), element_at(typedLit(keys), col("i") + 1)),
        Enrich.parseNumber(col("v")), map(lit("cpu"), col("id"))): _*)
    val ctxt = lines.filter(f.getItem(0) === "ctxt")
      .select(metricRow(time, "counter", host, lit("cpu.ctxt"),
        Enrich.parseNumber(f.getItem(1)), noTags): _*)
    percpu.unionByName(ctxt)
  }

  /** S3/S4 — `/proc/loadavg` → `load.{1,5,15}`; `/proc/uptime` → `uptime`
    * (ref: collector/system.go:26-53).
    */
  def loadavg(lines: DataFrame, time: Column, host: Column): DataFrame = {
    val f = fields(col("line"))
    lines.limit(1)
      .select(posexplode(slice(f, 1, 3)).as(Seq("i", "v")))
      .select(metricRow(time, "gauge", host,
        concat(lit("load."), element_at(typedLit(Seq("1", "5", "15")), col("i") + 1)),
        Enrich.parseFloat(col("v")), noTags): _*)
  }

  def uptime(lines: DataFrame, time: Column, host: Column): DataFrame =
    lines.limit(1)
      .select(metricRow(time, "gauge", host, lit("uptime"),
        Enrich.parseFloat(fields(col("line")).getItem(0)), noTags): _*)

  /** S5 — `/proc/diskstats`: 17 counters `disk.<statKey>` tagged `{device}`,
    * `loop*` devices skipped (ref: collector/disk.go:18-64).
    */
  def diskstats(lines: DataFrame, time: Column, host: Column): DataFrame = {
    val keys = Seq(
      "reads_completed", "reads_merged", "sectors_read", "time_spent_reading",
      "writes_completed", "writes_merged", "sectors_written", "time_spent_writing",
      "io_in_progress", "time_spent_doing_io", "weighted_time_spent_doing_io",
      "discards_completed", "discards_merged", "sectors_discarded",
      "time_spend_discarding", "flush_requests_completed", "time_spent_flushing")
    val f = fields(col("line"))
    lines
      .select(f.getItem(2).as("device"), slice(f, 4, keys.size).as("vals"))
      .filter(col("device").isNotNull && !col("device").startsWith("loop"))
      .select(col("device"), posexplode(col("vals")).as(Seq("i", "v")))
      .select(metricRow(time, "counter", host,
        concat(lit("disk."), element_at(typedLit(keys), col("i") + 1)),
        Enrich.parseNumber(col("v")), map(lit("device"), col("device"))): _*)
  }

  /** S7 — `/proc/net/dev`: `net.{rx,tx}.{bytes,packets}` tagged `{iface}`;
    * `veth*`/`br-*` skipped (ref: collector/net.go:26-87). The reference's
    * `Rx.Drop` overwrite bug (net.go:53) is NOT replicated — drops are
    * simply not emitted, like its metric output.
    */
  def netDev(lines: DataFrame, time: Column, host: Column): DataFrame = {
    val f = fields(col("line"))
    lines
      .filter(col("line").contains(":"))
      .select(regexp_replace(f.getItem(0), ":$", "").as("iface"),
        Enrich.parseNumber(f.getItem(1)).as("rx_bytes"),
        Enrich.parseNumber(f.getItem(2)).as("rx_packets"),
        Enrich.parseNumber(f.getItem(9)).as("tx_bytes"),
        Enrich.parseNumber(f.getItem(10)).as("tx_packets"))
      .filter(!col("iface").startsWith("veth") && !col("iface").startsWith("br-"))
      .select(col("iface"), explode(map(
        lit("net.rx.bytes"), col("rx_bytes"), lit("net.rx.packets"), col("rx_packets"),
        lit("net.tx.bytes"), col("tx_bytes"), lit("net.tx.packets"), col("tx_packets")))
        .as(Seq("name", "v")))
      .select(metricRow(time, "counter", host, col("name"), col("v"),
        map(lit("iface"), col("iface"))): _*)
  }

  /** S2 — `/proc/meminfo` → the five osstat-computed gauges
    * `memory.{total,used,cached,free,available}` (ref:
    * collector/system.go:13-24, which reads go-osstat's memory.Get).
    * go-osstat's linux derivation from the kB-denominated meminfo rows:
    * total=MemTotal, free=MemFree, cached=Cached+SReclaimable,
    * used=total-free-Buffers-cached, available=MemAvailable; all ×1024 to
    * bytes. One aggregate pivot over the lines, then five metric rows.
    */
  def meminfo(lines: DataFrame, time: Column, host: Column): DataFrame = {
    val key = regexp_extract(col("line"), "^(\\w+):", 1)
    val v = Enrich.parseNumber(fields(col("line")).getItem(1)) * 1024
    def pick(name: String): Column =
      coalesce(first(when(col("k") === name, col("v")), ignoreNulls = true), lit(0.0))
    lines.select(key.as("k"), v.as("v"))
      .agg(pick("MemTotal").as("total"), pick("MemFree").as("free"),
        pick("MemAvailable").as("available"), pick("Buffers").as("buffers"),
        (pick("Cached") + pick("SReclaimable")).as("cached"))
      .select(explode(map(
        lit("memory.total"), col("total"),
        lit("memory.used"),
        col("total") - col("free") - col("buffers") - col("cached"),
        lit("memory.cached"), col("cached"),
        lit("memory.free"), col("free"),
        lit("memory.available"), col("available"))).as(Seq("name", "v")))
      .select(metricRow(time, "gauge", host, col("name"), col("v"), noTags): _*)
  }

  /** S8/S13-style — generic `key value` lines (vmstat, fscache rows, cgroup
    * cpu.stat/memory.stat) → counters `<prefix>.<key>`
    * (ref: collector/vmstat.go:14-40, collector/cgroup/cgroup.go:86-102).
    */
  def kvCounters(lines: DataFrame, time: Column, host: Column, prefix: String,
      tags: Column = noTags): DataFrame = {
    val f = fields(col("line"))
    lines
      .filter(size(f) >= 2)
      .select(metricRow(time, "counter", host,
        concat(lit(prefix + "."), f.getItem(0)),
        Enrich.parseNumber(f.getItem(1)), tags): _*)
  }

  /** S9 — `/proc/net/netstat` header/value line pairs: each section's header
    * tokens zip positionally with the following value line
    * (ref: collector/tcp.go:14-54). Needs a line index (`idx`) since
    * DataFrames don't order rows; the pairing is a positional `zip_with`
    * after a self-join of consecutive lines — no stateful scan.
    */
  def netstat(lines: DataFrame, time: Column, host: Column): DataFrame = {
    val f = fields(col("line"))
    val parsed = lines.select(col("idx"),
      regexp_extract(col("line"), "^(\\S+):", 1).as("section"), f.as("toks"))
    val headers = parsed.filter(col("idx") % 2 === 0)
      .select(col("idx"), col("section"), col("toks").as("hdr"))
    val values = parsed.filter(col("idx") % 2 === 1)
      .select((col("idx") - 1).as("idx"), col("section").as("vsection"),
        col("toks").as("vals"))
    headers.join(values, "idx")
      .filter(col("section") === col("vsection"))
      .select(col("section"),
        explode(arrays_zip(slice(col("hdr"), 2, 10000), slice(col("vals"), 2, 10000)))
          .as("kv"))
      .select(metricRow(time, "counter", host,
        concat(col("section"), lit("."), col("kv.0")),
        Enrich.parseNumber(col("kv.1")), noTags): _*)
  }

  /** S6 — `df --output=source,target,fstype,...,avail,used,...` rows →
    * gauges `disk.{free,used}` tagged `{path,mount,type}`; pseudo
    * filesystems skipped (ref: collector/disk.go:77-141).
    */
  def dfOutput(lines: DataFrame, time: Column, host: Column): DataFrame = {
    val skipTypes = Seq("tmpfs", "sysfs", "proc", "overlay", "devtmpfs", "efivarfs")
    val f = fields(col("line"))
    lines
      .filter(!col("line").startsWith("Filesystem"))
      .select(f.getItem(0).as("path"), f.getItem(1).as("mount"),
        f.getItem(2).as("type"),
        Enrich.parseNumber(f.getItem(9)).as("free"),
        Enrich.parseNumber(f.getItem(10)).as("used"))
      .filter(!col("type").isin(skipTypes: _*))
      .select(col("path"), col("mount"), col("type"),
        explode(map(lit("disk.free"), col("free"), lit("disk.used"), col("used")))
          .as(Seq("name", "v")))
      .select(metricRow(time, "gauge", host, col("name"), col("v"),
        map(lit("path"), col("path"), lit("mount"), col("mount"),
          lit("type"), col("type"))): _*)
  }

  /** S10 — `sensors -j -A` three-level JSON: chip → feature → sub-reading,
    * emitted as gauges `sensors.<sub>` tagged `{chip, feature}`, names
    * normalized (ref: collector/sensors.go:22-60).
    */
  def sensorsJson(doc: DataFrame, time: Column, host: Column,
      column: String = "value"): DataFrame = {
    val schema = MapType(StringType, MapType(StringType,
      MapType(StringType, DoubleType)))
    doc.select(from_json(col(column), schema).as("j"))
      .filter(col("j").isNotNull)
      .select(explode(col("j")).as(Seq("chip", "features")))
      .select(col("chip"), explode(col("features")).as(Seq("feature", "subs")))
      .select(col("chip"), col("feature"), explode(col("subs")).as(Seq("sub", "v")))
      .select(metricRow(time, "gauge", host,
        concat(lit("sensors."), Enrich.normalizeSensorName(col("sub"))),
        col("v"),
        map(lit("chip"), col("chip"),
          lit("feature"), Enrich.normalizeSensorName(col("feature")))): _*)
  }
}
