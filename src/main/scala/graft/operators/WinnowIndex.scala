package graft.operators

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained winnow-fingerprint artifact — the persisted form of the
  * corpus fingerprint set [[graft.streaming.WinnowStream]] matches
  * against, promoted (r9) from a caller-managed recompute to a
  * TextIndex-parity maintained artifact: build once, fold new document
  * slices in with [[appendTo]], bound file count with [[compact]], and
  * serve through the same refresh-snapshot lifecycle.
  *
  * Layout under `root`:
  *  - `fps/` — parquet (fp: long), the corpus's distinct selected
  *    fingerprints (~2/(w+1) of the gram count). May hold MULTIPLE
  *    segments with duplicate fps ACROSS segments after appends —
  *    benign by construction: every serving path dedupes at load
  *    (the refresh loader's per-refresh `.distinct()`), and [[compact]]
  *    collapses them. This value-idempotence is also what makes the
  *    append replay-safe with no marker protocol: an at-least-once
  *    re-delivery adds duplicate ROWS, never duplicate MATCHES.
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
  * 100 TB posture: the artifact is the only corpus-scale object and it
  * moves once per refresh; appends are slice-sized; compaction is one
  * sorted pass (production would shard by fp range behind a manifest,
  * like the text index's term shards).
  */
object WinnowIndex {

  def fpsDir(root: String): String = s"$root/fps"

  /** Per-dataset artifact root, keyed by the dataset fingerprint AND
    * the winnow parameters — fingerprints selected at one (k, w) are
    * meaningless against another's, so a parameter change must build a
    * sibling artifact, never silently serve the first builder's
    * (`_family` plays the same role for the hash tier).
    */
  private[graft] def indexPath(dir: String, k: Int, w: Int): String = {
    val fp = graft.Tables.fingerprint(dir, "documents")
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-index/$safe-$fp/winnow_v1_k${k}w$w"
  }

  /** Build-if-missing over the dataset's CORPUS slice (doc_id ≢ 0
    * mod 3 — the q_winnow_match fixture split: the remaining third is
    * the probe side); returns the index root. Publish is the shared
    * [[Artifacts.ensureRoot]] two-JVM-safe atomic whole-root rename,
    * with completeness = root marker + the fps artifact's own
    * `_SUCCESS`. The q_winnow_match_indexed driver row recomputes the
    * same report from RAW documents in DuckDB, so a green row is a
    * standing consistency proof for this maintained artifact — the
    * q_route_stats / termStats role.
    */
  def ensure(spark: SparkSession, dir: String, k: Int = 3,
      w: Int = 4): String =
    // the _family marker is part of completeness: serving hard-requires
    // it, so a root that lost the marker must rebuild, not be returned
    // forever in a permanently-refused state
    Artifacts.ensureRoot(indexPath(dir, k, w))(p =>
      new File(s"${fpsDir(p)}/_SUCCESS").exists() &&
        familyFile(p).exists()) { tmp =>
      val corpus = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 3 =!= 0)
      buildInto(tmp, corpus, k, w)
    }

  private def familyFile(root: String) = new File(root, "_family")

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
    val stage = s"${fpsDir(root)}.tmp-${java.util.UUID.randomUUID()}"
    TextOps.winnowOver(docs, k, w, family).select("fp").distinct()
      .write.parquet(stage)
    if (new File(fpsDir(root)).exists())
      Artifacts.publishByRename(fpsDir(root), stage)
    else require(new File(stage).renameTo(new File(fpsDir(root))),
      s"publish rename to ${fpsDir(root)} failed")
  }

  /** Fold a NEW document slice in: its distinct selected fingerprints
    * append as additional segment files — slice-sized work, the corpus
    * is never re-read. Duplicates against existing segments are benign
    * (see class doc); serving ≡ full rebuild is spec-pinned.
    */
  def appendTo(root: String, newDocs: DataFrame, k: Int = 3, w: Int = 4,
      family: TextOps.WinnowHash = TextOps.WinnowMd5): Unit = {
    require(new File(fpsDir(root)).exists(),
      s"appendTo on $root with no fps/ — build or recover first")
    requireFamily(root, family)
    TextOps.winnowOver(newDocs, k, w, family).select("fp").distinct()
      .write.mode("append").parquet(fpsDir(root))
  }

  /** Collapse the appended segments into one distinct sorted pass —
    * same fingerprint SET, restored file economy (file count is what
    * degrades scan setup at scale). Publishes through the shared
    * crash-recoverable rename chain.
    *
    * `targetFiles` BOUNDS the output file count explicitly — under the
    * 200-partition shuffle default a bare `distinct()` would write one
    * file per post-shuffle partition and compaction would never get the
    * segment count under a maintainer's bound (re-triggering a
    * full-artifact rewrite every micro-batch). `repartition`, not
    * `coalesce`: coalesce would propagate the narrow width upstream and
    * serialize the distinct itself. The probe-scale default is one
    * file; a production deployment passes its fp-range shard count.
    */
  def compact(root: String, spark: SparkSession, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    recover(root)
    val fps = spark.read.parquet(fpsDir(root)).select("fp").distinct()
      .repartition(targetFiles)
      .sortWithinPartitions("fp")
    val tmp = s"${fpsDir(root)}.tmp-${java.util.UUID.randomUUID()}"
    fps.write.parquet(tmp)
    Artifacts.publishByRename(fpsDir(root), tmp)
  }

  /** Heal a crashed compaction swap — call at maintenance entry. */
  def recover(root: String): Unit =
    Artifacts.recoverArtifacts(root, Seq("fps"))

  /** Segment-count proxy the streaming maintainer bounds ([[compact]]
    * when exceeded): parquet file count in the fps artifact.
    */
  private[graft] def segments(root: String): Int =
    Option(new File(fpsDir(root)).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)
}
