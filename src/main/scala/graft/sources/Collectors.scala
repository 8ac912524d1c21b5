package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import graft.operators.Enrich

/** Remaining exec-based collectors (SURVEY.md §2.1: S11 zfs kstat, S12 gpu,
  * S14 apt, S15 cgroup io.stat) as declarative parses of captured command /
  * file output. Same shape as [[Procfs]]: `line` column in → canonical
  * metric rows out.
  */
object Collectors {

  private val noTags = map().cast(MapType(StringType, StringType, valueContainsNull = false))

  private def metricRow(time: Column, mtype: String, host: Column, name: Column,
      value: Column, tags: Column): Seq[Column] = Seq(
    time.as("time"), lit(mtype).as("type"), host.as("host"), name.as("name"),
    value.cast("double").as("value"), tags.as("tags"))

  /** S11 — kstat format (`/proc/spl/kstat/zfs/...`): two header lines, then
    * `name type data` rows → counters `<prefix>.<name>`
    * (ref: collector/zfs.go:19-43). Needs an `idx` column (line number) to
    * drop the headers, mirroring the reference's `idx < 2` skip.
    */
  def kstat(lines: DataFrame, time: Column, host: Column, prefix: String,
      tags: Column = noTags): DataFrame = {
    val f = Enrich.splitFields(col("line"))
    lines
      .filter(col("idx") >= 2 && size(f) === 3)
      .select(metricRow(time, "counter", host,
        concat(lit(prefix + "."), f.getItem(0)),
        Enrich.parseNumber(f.getItem(2)), tags): _*)
  }

  /** S12 — `nvidia-smi --query-gpu=index,name,temperature.gpu,memory.used,
    * memory.total,utilization.gpu,power.draw --format=csv,noheader,nounits`:
    * gauges `gpu.nvidia.<index>.{temperature,memory.used,memory.total,
    * utilization,powerdraw}` tagged `{device}` (ref: collector/gpu.go:30-112).
    * Unparseable values drop that metric (the reference warns and skips,
    * NOT zero-fills — unlike the procfs parsers). The first four fields are
    * integers (ref Atoi); power.draw is fractional (ref ParseFloat,
    * gpu.go:100) — real nvidia-smi emits e.g. "38.96 W".
    */
  def nvidiaSmi(lines: DataFrame, time: Column, host: Column): DataFrame = {
    val f = split(col("line"), ",\\s*")
    val keys = Seq("temperature", "memory.used", "memory.total", "utilization", "powerdraw")
    lines
      .filter(size(f) >= 7)
      .select(f.getItem(0).as("idx"), f.getItem(1).as("device"),
        posexplode(slice(f, 3, keys.size)).as(Seq("i", "v")))
      .withColumn("value",
        when(col("i") === keys.size - 1, col("v").try_cast("double"))
          .otherwise(col("v").try_cast("long").cast("double")))
      .filter(col("value").isNotNull) // parse failure → skip, not 0
      .select(metricRow(time, "gauge", host,
        concat(lit("gpu.nvidia."), col("idx"), lit("."),
          element_at(typedLit(keys), col("i") + 1)),
        col("value"), map(lit("device"), col("device"))): _*)
  }

  /** S12 — `rocm-smi --showid --showtemp --showuse --showpower
    * --showproductname --showmeminfo vram --json`: one JSON document
    * mapping card id → readings under rocm's long literal keys, emitted as
    * gauges `gpu.amd.<cardId>.{temperature,memory.used,memory.total,
    * utilization,powerdraw}` tagged `{guid, device}`
    * (ref: collector/gpu.go:114-198). Temperature parses as float
    * (ParseFloat); the other four are integers (Atoi) — a fractional
    * string fails Atoi and that metric is skipped, like the reference's
    * warn-and-continue (no zero-fill).
    */
  def rocmSmi(doc: DataFrame, time: Column, host: Column,
      column: String = "value"): DataFrame = {
    val schema = MapType(StringType, MapType(StringType, StringType))
    // (metric key suffix, rocm JSON field, integer-only parse)
    val fields = Seq(
      ("temperature", "Temperature (Sensor edge) (C)", false),
      ("memory.used", "VRAM Total Used Memory (B)", true),
      ("memory.total", "VRAM Total Memory (B)", true),
      ("utilization", "GPU use (%)", true),
      ("powerdraw", "Current Socket Graphics Package Power (W)", true))
    val readings = array(fields.map { case (key, field, intOnly) =>
      val raw = col("card").getItem(field)
      val v = if (intOnly) raw.try_cast("long").cast("double")
              else raw.try_cast("double")
      struct(lit(key).as("key"), v.as("v"))
    }: _*)
    doc.select(from_json(col(column), schema).as("j"))
      .filter(col("j").isNotNull)
      .select(explode(col("j")).as(Seq("cardId", "card")))
      .select(col("cardId"),
        col("card").getItem("GUID").as("guid"),
        col("card").getItem("Card series").as("device"),
        explode(readings).as("r"))
      .filter(col("r.v").isNotNull) // parse failure → skip, not 0
      .select(metricRow(time, "gauge", host,
        concat(lit("gpu.amd."), col("cardId"), lit("."), col("r.key")),
        col("r.v"),
        map(lit("guid"), coalesce(col("guid"), lit("")),
          lit("device"), coalesce(col("device"), lit("")))): _*)
  }

  /** S14 — `apt list --upgradable` + `apt list --installed`: three gauges
    * `apt.packages` tagged by {security, upgradable}, where a package is
    * security-relevant when its repo component contains `-security`
    * (ref: collector/apt.go:15-81). Pure aggregation — counts never leave
    * the cluster.
    */
  def aptPackages(upgradable: DataFrame, installed: DataFrame, time: Column,
      host: Column): DataFrame = {
    val repo = split(split(col("line"), " ").getItem(0), "/").getItem(1)
    val counts = upgradable
      .filter(repo.isNotNull)
      .agg(
        sum(when(repo.contains("-security"), 1).otherwise(0)).as("security"),
        sum(when(repo.contains("-security"), 0).otherwise(1)).as("upgr"))
    val total = installed.agg(count(lit(1)).as("total"))
    counts.crossJoin(total)
      .select(explode(array(
        struct((col("total") - col("security") - col("upgr")).as("v"),
          lit("false").as("sec"), lit("false").as("upg")),
        struct(col("upgr").cast("long").as("v"), lit("false").as("sec"), lit("true").as("upg")),
        struct(col("security").cast("long").as("v"), lit("true").as("sec"), lit("true").as("upg"))))
        .as("r"))
      .select(metricRow(time, "gauge", host, lit("apt.packages"),
        col("r.v"), map(lit("security"), col("r.sec"), lit("upgradable"), col("r.upg"))): _*)
  }

  /** S15 — cgroup `io.stat`: `maj:min [maj:min ...] k=v k=v ...` rows, one
    * metric per (device, key) pair → counters `cgroup.iostat.<k>` tagged
    * with the device name/type resolved through a device-info dimension
    * (the reference stats `/sys/dev/block/<maj:min>/uevent` with a cache,
    * ref: collector/cgroup/cgroup.go:115-189; at scale that's exactly a
    * broadcast join against a small dim table).
    *
    * @param devices (devno, device_name, device_type) dimension
    */
  def cgroupIoStat(lines: DataFrame, time: Column, host: Column,
      devices: DataFrame, cgroupTags: Column = noTags): DataFrame = {
    val toks = Enrich.splitFields(col("line"))
    val devnos = filter(toks, t => !t.contains("="))
    val kvs = filter(toks, t => t.contains("="))
    lines
      .filter(size(devnos) >= 1 && size(kvs) >= 1)
      .select(explode(devnos).as("devno"), kvs.as("kvs"), cgroupTags.as("ctags"))
      .join(broadcast(devices), Seq("devno"), "left")
      .select(col("devno"), col("device_name"), col("device_type"), col("ctags"),
        explode(col("kvs")).as("kv"))
      .select(metricRow(time, "counter", host,
        concat(lit("cgroup.iostat."), split(col("kv"), "=").getItem(0)),
        Enrich.parseNumber(split(col("kv"), "=").getItem(1)),
        map_concat(col("ctags"),
          map(lit("device_name"), coalesce(col("device_name"), col("devno")),
            lit("device_type"), coalesce(col("device_type"), lit("unknown"))))): _*)
  }
}
