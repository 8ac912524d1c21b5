package graft.operators

import java.io.File
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained winnow-fingerprint artifact — the persisted form of the
  * corpus fingerprint set [[graft.streaming.WinnowStream]] matches
  * against, promoted (r9) from a caller-managed recompute to a
  * TextIndex-parity maintained artifact, and SHARDED BY FP RANGE behind
  * a manifest since r10 (the production posture r9's docstring named):
  * build once, fold new document slices in with [[appendTo]], bound
  * per-shard file count with [[compact]], and serve through the same
  * refresh-snapshot lifecycle — with membership reads PRUNED to the
  * probe batch's fp ranges ([[membershipFps]]).
  *
  * Layout under `root`:
  *  - `fps/shard=<id>/` — parquet (fp: long) partitioned by the fp's
  *    RANGE shard: shard id = the fp's top log2([[shardCount]]) bits of
  *    its family's hash space, so each dir holds one contiguous fp
  *    range (uniform hashes → balanced shards) and a membership probe
  *    touches only the dirs its fps fall in — read volume tracks the
  *    PROBE's distinct ranges, never the corpus. Shards are fp-sorted
  *    within files (row-group min/max locality for the range reads).
  *    May hold duplicate fps ACROSS segment files after appends —
  *    benign by construction: every serving path dedupes at load, and
  *    [[compact]] collapses them. This value-idempotence is also what
  *    makes the append replay-safe with no marker protocol: an
  *    at-least-once re-delivery adds duplicate ROWS, never duplicate
  *    MATCHES.
  *  - `_manifest` — the shard scheme: format version, shard count, and
  *    one line per shard with its [lo, hi] fp range. Serving validates
  *    the manifest against the family's expected ranges and fails fast
  *    on a mismatch (an artifact sharded under a different scheme must
  *    rebuild, never silently under-prune).
  *  - `_family` — the gram-hash tier ([[TextOps.WinnowHash]]) the index
  *    was built with, written BEFORE the first fps write (so no crash
  *    window leaves fps without it); appends and serving fail fast on a
  *    mismatch — fingerprints from different families silently match
  *    nothing, the worst kind of wrong.
  *
  * Crash consistency: compaction publishes through the shared
  * [[Artifacts]] aside-rename chain; [[recover]] heals any crash point
  * at maintenance entry. A crashed APPEND leaves either staged
  * `_temporary` residue (the committer's, invisible to readers) or a
  * committed subset of the slice's segment files — the replayed append
  * re-adds the slice and the duplicates collapse by value, so every
  * crash point converges without a marker protocol.
  *
  * 100 TB posture: the fingerprint set is itself large at corpus scale;
  * range sharding is what keeps (a) membership reads probe-bounded,
  * (b) compaction shard-local (each shard rewrites independently — here
  * one job writes all shards, the manifest is what production hangs
  * per-shard maintenance off), (c) appends slice-sized (only touched
  * shard dirs gain a file).
  */
object WinnowIndex {

  def fpsDir(root: String): String = s"$root/fps"

  /** Shard count = the artifact's pruning/parallelism unit (the
    * TextIndex term-shard role). 64 keeps a probe's touched fraction
    * observable at spec scale; production sizes this so a shard stays
    * a few GB (thousands at 100 TB).
    */
  private[operators] val shardCount = 64

  private val shardBits = 6 // log2(shardCount)

  /** The shard of an fp column under `family`'s hash space: its top
    * [[shardBits]] bits, i.e. which of [[shardCount]] equal contiguous
    * ranges the fp falls in — md5-60bit fps live in [0, 2^60);
    * xxhash64 fps span the full signed long range, so the arithmetic
    * shift is offset by shardCount/2 to map [-32, 31] onto [0, 63]
    * with shard ids ascending in SIGNED fp order, matching the ranges
    * [[shardRanges]] lists.
    */
  private[graft] def shardOf(fp: Column, family: TextOps.WinnowHash): Column =
    family match {
      case TextOps.WinnowMd5 => shiftright(fp, 60 - shardBits).cast("int")
      case TextOps.WinnowXx =>
        (shiftright(fp, 64 - shardBits) + lit(shardCount / 2)).cast("int")
    }

  /** The range-keyed shard table: (id, lo, hi) with lo/hi inclusive —
    * what `_manifest` records and serving validates.
    */
  private[graft] def shardRanges(
      family: TextOps.WinnowHash): Seq[(Int, Long, Long)] = family match {
    case TextOps.WinnowMd5 =>
      val width = 1L << (60 - shardBits)
      (0 until shardCount).map(i => (i, i * width, (i + 1) * width - 1))
    case TextOps.WinnowXx =>
      val width = 1L << (64 - shardBits)
      (0 until shardCount).map { i =>
        val lo = Long.MinValue + (i.toLong * width)
        (i, lo, lo + width - 1)
      }
  }

  /** Per-dataset artifact root, keyed by the dataset fingerprint AND
    * the winnow parameters — fingerprints selected at one (k, w) are
    * meaningless against another's, so a parameter change must build a
    * sibling artifact, never silently serve the first builder's
    * (`_family` plays the same role for the hash tier). `v2` = the
    * range-sharded layout (v1 was one flat dir); a format change keys a
    * fresh root, never a half-migrated one.
    */
  private[graft] def indexPath(dir: String, k: Int, w: Int): String = {
    val fp = graft.Tables.fingerprint(dir, "documents")
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-index/$safe-$fp/winnow_v2_k${k}w$w"
  }

  /** Build-if-missing over the dataset's CORPUS slice (doc_id ≢ 0
    * mod 3 — the q_winnow_match fixture split: the remaining third is
    * the probe side); returns the index root. Publish is the shared
    * [[Artifacts.ensureRoot]] two-JVM-safe atomic whole-root rename,
    * with completeness = root marker + the fps artifact's own
    * `_SUCCESS` + family + manifest. The q_winnow_match_indexed driver
    * row recomputes the same report from RAW documents in DuckDB, so a
    * green row is a standing consistency proof for this maintained
    * artifact — the q_route_stats / termStats role.
    */
  def ensure(spark: SparkSession, dir: String, k: Int = 3,
      w: Int = 4): String =
    // the _family/_manifest markers are part of completeness: serving
    // hard-requires them, so a root that lost either must rebuild, not
    // be returned forever in a permanently-refused state
    Artifacts.ensureRoot(indexPath(dir, k, w))(p =>
      new File(s"${fpsDir(p)}/_SUCCESS").exists() &&
        familyFile(p).exists() && manifestFile(p).exists()) { tmp =>
      val corpus = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 3 =!= 0)
      buildInto(tmp, corpus, k, w)
    }

  private def familyFile(root: String) = new File(root, "_family")
  private def manifestFile(root: String) = new File(root, "_manifest")

  /** The family the artifact at `root` was built with, if any. */
  private[graft] def familyOf(root: String): Option[String] = {
    val f = familyFile(root)
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim)
  }

  private def requireFamily(root: String, family: TextOps.WinnowHash): Unit =
    familyOf(root).foreach(have => require(have == family.name,
      s"winnow index at $root was built with hash family '$have', " +
        s"refusing to touch it as '${family.name}' — cross-family " +
        "fingerprints silently match nothing"))

  /** The SERVING-path family gate, shared by every reader
    * ([[TextOps.winnowMatchIndexed]],
    * [[graft.streaming.WinnowStream.matchesVsIndexRefreshing]]): unlike
    * the maintenance-side [[requireFamily]] (which tolerates an absent
    * marker — a fresh root has none yet), serving REQUIRES the marker
    * to exist and match, because an unmarked or cross-family set
    * silently matches nothing — the worst kind of wrong.
    */
  private[graft] def requireServableFamily(root: String,
      family: TextOps.WinnowHash): Unit = {
    val have = familyOf(root)
    require(have.contains(family.name),
      s"winnow index at $root carries family ${have.orNull} " +
        s"(serving requested '${family.name}') — refusing to serve " +
        "cross-family or unmarked fingerprints")
  }

  private def writeManifest(root: String, family: TextOps.WinnowHash): Unit = {
    val body = (s"version=2\nshards=$shardCount\nfamily=${family.name}\n" +
      shardRanges(family).map { case (i, lo, hi) => s"shard=$i\t$lo\t$hi" }
        .mkString("", "\n", "\n"))
    java.nio.file.Files.write(manifestFile(root).toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }

  /** Parse and VALIDATE the manifest against `family`'s expected shard
    * scheme — pruned serving depends on the dirs actually being keyed
    * by these ranges, so a scheme drift (format upgrade, hand-edited
    * artifact) must fail loudly, never under-read.
    */
  private[graft] def requireManifest(root: String,
      family: TextOps.WinnowHash): Unit = {
    val f = manifestFile(root)
    require(f.exists(), s"winnow index at $root has no _manifest — " +
      "unsharded/v1 or torn artifact; rebuild before pruned serving")
    val lines = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
    require(lines.contains(s"shards=$shardCount") &&
      lines.contains(s"family=${family.name}"),
      s"winnow index manifest at $root does not match the expected " +
        s"scheme (shards=$shardCount, family=${family.name}): $lines")
    val ranges = lines.filter(_.startsWith("shard=")).map { l =>
      val Array(id, lo, hi) = l.stripPrefix("shard=").split('\t')
      (id.toInt, lo.toLong, hi.toLong)
    }
    require(ranges == shardRanges(family),
      s"winnow index manifest ranges at $root diverge from the " +
        s"family scheme — refusing to prune against them")
  }

  /** Stage an fps frame as a range-sharded, fp-sorted parquet tree:
    * one exchange on the shard key so each shard dir is written by one
    * task (file count = one per shard), fp sort within for row-group
    * min/max locality — the TextIndex writeSharded shape at fp grain.
    */
  private def writeSharded(fps: DataFrame, family: TextOps.WinnowHash,
      path: String): Unit =
    fps.withColumn("shard", shardOf(col("fp"), family))
      .repartition(col("shard"))
      .sortWithinPartitions("fp")
      .write.partitionBy("shard")
      .option("compression", "zstd")
      .parquet(path)

  /** Build (or rebuild) the index under `root` from a corpus frame.
    * A REBUILD over an existing root publishes through the same
    * aside-rename chain as compaction — a crash mid-rebuild must leave
    * the previous servable artifact (or a recoverable aside), never a
    * partially committed fps dir the refresh loader would silently
    * under-match against.
    */
  def buildInto(root: String, docs: DataFrame, k: Int = 3, w: Int = 4,
      family: TextOps.WinnowHash = TextOps.WinnowMd5): Unit = {
    new File(root).mkdirs()
    recover(root) // heal a previously crashed swap before staging
    requireFamily(root, family) // a rebuild must not silently flip tiers
    java.nio.file.Files.write(familyFile(root).toPath,
      (family.name + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    writeManifest(root, family) // before fps, like _family: no torn window
    val stage = s"${fpsDir(root)}.tmp-${java.util.UUID.randomUUID()}"
    writeSharded(
      TextOps.winnowOver(docs, k, w, family).select("fp").distinct(),
      family, stage)
    if (new File(fpsDir(root)).exists())
      Artifacts.publishByRename(fpsDir(root), stage)
    else require(new File(stage).renameTo(new File(fpsDir(root))),
      s"publish rename to ${fpsDir(root)} failed")
  }

  /** Fold a NEW document slice in: its distinct selected fingerprints
    * append as one additional segment file per TOUCHED shard dir —
    * slice-sized work, the corpus is never re-read. The single
    * pre-write partition bounds the append's file count explicitly
    * (compact's rationale: under the shuffle default a bare distinct
    * would land one file per post-shuffle partition PER SHARD, and a
    * micro-batch append could alone exceed a maintainer's segment
    * bound, re-triggering a full compact every batch). Duplicates
    * against existing segments are benign (see class doc); serving ≡
    * full rebuild is spec-pinned.
    */
  def appendTo(root: String, newDocs: DataFrame, k: Int = 3, w: Int = 4,
      family: TextOps.WinnowHash = TextOps.WinnowMd5): Unit = {
    require(new File(fpsDir(root)).exists(),
      s"appendTo on $root with no fps/ — build or recover first")
    requireFamily(root, family)
    requireManifest(root, family)
    TextOps.winnowOver(newDocs, k, w, family).select("fp").distinct()
      .withColumn("shard", shardOf(col("fp"), family))
      .repartition(1)
      .sortWithinPartitions("shard", "fp")
      .write.mode("append").partitionBy("shard")
      .option("compression", "zstd")
      .parquet(fpsDir(root))
  }

  /** Collapse the appended segments: one distinct, fp-sorted file per
    * shard — same fingerprint SET, restored file economy (per-shard
    * file count is what degrades scan setup at scale). Publishes the
    * whole fps tree through the shared crash-recoverable rename chain;
    * at production scale each shard compacts independently behind the
    * manifest (the ranges make shards disjoint by construction), this
    * probe-scale form rewrites them in one job.
    */
  def compact(root: String, spark: SparkSession,
      family: TextOps.WinnowHash = TextOps.WinnowMd5): Unit = {
    recover(root)
    requireManifest(root, family)
    val fps = spark.read.parquet(fpsDir(root)).select("fp").distinct()
    val tmp = s"${fpsDir(root)}.tmp-${java.util.UUID.randomUUID()}"
    writeSharded(fps, family, tmp)
    Artifacts.publishByRename(fpsDir(root), tmp)
  }

  /** Membership serving, PRUNED to the probe's fp ranges: the probe's
    * distinct shard ids (a bounded collect — at most [[shardCount]]
    * values) become partition-pruning literals on the fps read, so the
    * scan touches only the shard dirs the probe's fingerprints can
    * possibly match in — read volume is bounded by the probe's range
    * coverage, not the corpus (a matching fp has the probe fp's shard
    * by construction). Returns the pruned DISTINCT fp set, exactly the
    * frame [[TextOps.winnowMatchReport]] consumes.
    */
  private[graft] def membershipFps(spark: SparkSession, root: String,
      probeFps: DataFrame,
      family: TextOps.WinnowHash = TextOps.WinnowMd5): DataFrame = {
    requireServableFamily(root, family)
    requireManifest(root, family)
    val ids = probeFps.select(shardOf(col("fp"), family).as("s"))
      .distinct().collect().map(_.getInt(0)).sorted
    spark.read.parquet(fpsDir(root))
      .filter(col("shard").isin(ids.map(Integer.valueOf).toSeq: _*))
      .select("fp").distinct()
  }

  /** Heal a crashed compaction swap — call at maintenance entry. */
  def recover(root: String): Unit =
    Artifacts.recoverArtifacts(root, Seq("fps"))

  /** Segment-count proxy the streaming maintainer bounds ([[compact]]
    * when exceeded): MAX parquet file count across shard dirs (each
    * append adds at most one file per touched shard, so this tracks
    * appends-since-compact, not corpus size — the
    * TextIndex.postingsSegments shape).
    */
  private[graft] def segments(root: String): Int =
    Option(new File(fpsDir(root)).listFiles()).map { entries =>
      entries.filter(d => d.isDirectory && d.getName.startsWith("shard="))
        .map(d => Option(d.listFiles())
          .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0))
        .foldLeft(0)(math.max)
    }.getOrElse(0)
}
