package graft.operators

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained per-modality perceptual-hash artifact (r13) — the media
  * family's TextIndex/WinnowIndex/VectorIndex parity, closing the one
  * dedup modality that still paid corpus-sized recompute per query:
  * [[MultimodalOps.imageNearDup]]/[[MultimodalOps.audioNearDup]] re-ran
  * container-build + decode + hash over the corpus on EVERY invocation
  * (decode dominating their cost), while every other dedup family served
  * ingest-amortized hashes. At 100 TB you hash media once at ingest,
  * persist (media_id, h), and every near-dup query — batch pair report
  * or streaming new-media gate — band-joins against the stored hashes.
  *
  * Layout under `root`:
  *  - `hashes/shard=<id>/` — parquet (media_id, h) partitioned by a
  *    hash-derived shard (`pmod(xxhash64(h), shards)` — a pure function
  *    of h, so every copy of a row lands in exactly one shard dir and a
  *    per-shard distinct IS the global dedup for that slice), h-sorted
  *    within files. Segments may hold duplicate rows after an
  *    at-least-once replayed append — benign by VALUE (h is a pure
  *    function of the media content): serving dedupes at load and
  *    compaction collapses them, the WinnowIndex idempotence model.
  *  - `hashes/_meta` — the hash-pipeline FAMILY
  *    ([[MultimodalOps.imageHashFamily]]: packing + container + decode +
  *    hash chain version) and the shard count, INSIDE the tree so the
  *    code-space descriptor publishes atomically with the data it
  *    describes. Appends and serving fail fast on a mismatch: hashes
  *    from drifted pipelines band-join to garbage pairs (or silently
  *    match nothing), the cross-family failure mode every maintained
  *    family's `_meta`/`_family` gate refuses.
  *
  * Maintenance is the shared [[Artifacts]] protocol end-to-end:
  * [[ensure]] builds THROUGH the maintained chain (prefix build →
  * [[appendTo]] → [[compactShards]] → [[compact]], with in-builder
  * segment requires making the exercise structural), rebuilds and
  * compactions publish by the crash-recoverable aside-rename chain,
  * [[recover]] heals every crash point, and serving refuses loudly on
  * residue that outlives a healthy swap's window.
  *
  * 100 TB posture: the artifact is hash-sharded (compaction shard-local,
  * appends slice-sized — only touched shard dirs gain a file); the
  * banded pair join reads (media_id, h) rows — 16 bytes each — never
  * media bytes; candidate volume is the banded-join bound
  * ([[MultimodalOps.dhashBandPairs]]' ~2⁻¹⁶-per-band collision rate),
  * output-sensitive for true near-dup clusters, never all-pairs.
  */
object MediaHashIndex {

  /** A modality binds the artifact name, the hash-pipeline family the
    * `_meta` gate enforces, and the ONE shared hash pipeline
    * ((doc_id, text) frame → (media_id, h)) that build, append, and the
    * streaming maintainer all run — the family contract's single source.
    */
  final case class Modality(name: String, family: String,
      hashesOf: DataFrame => DataFrame)

  val Image: Modality = Modality("image", MultimodalOps.imageHashFamily,
    MultimodalOps.imageHashesOf)
  val Audio: Modality = Modality("audio", MultimodalOps.audioHashFamily,
    MultimodalOps.audioHashesOf)

  def hashesDir(root: String): String = s"$root/hashes"

  /** Default shard count — the artifact's unit of shard-local
    * maintenance (the WinnowIndex shardCount role): small enough that
    * spec-scale corpora populate every shard, a build parameter recorded
    * in `_meta` at production widths.
    */
  private[operators] val shardCount = 16

  private def metaFile(root: String) = new File(hashesDir(root), "_meta")

  /** Hash-derived shard of an `h` column: a pure function of the hash
    * value, so duplicate rows (replayed appends) always collide into the
    * same dir and per-shard dedup is exact.
    */
  private def shardOf(h: org.apache.spark.sql.Column, shards: Int) =
    pmod(xxhash64(h), lit(shards.toLong)).cast("int")

  /** (family, shards) recorded at build time, if a WELL-FORMED marker
    * exists — a torn `_meta` parses to None so the gates produce their
    * actionable refusal, never a raw parser error.
    */
  private[graft] def metaOf(root: String): Option[(String, Int)] =
    Artifacts.parseKvFile(metaFile(root)).flatMap { kv =>
      scala.util.Try {
        val shards = kv("shards").toInt
        require(shards >= 1 && kv("family").nonEmpty)
        (kv("family"), shards)
      }.toOption
    }

  /** The serving/maintenance gate: the marker must exist and carry the
    * caller's family — an unmarked artifact cannot prove its pipeline
    * version, and cross-family hashes pair to garbage.
    */
  private[graft] def requireMeta(root: String, family: String): Int = {
    val m = metaOf(root)
    require(m.isDefined, s"media hash index at $root carries no readable " +
      "hashes/_meta (pipeline family unknown) — refusing to serve or " +
      "maintain; rebuild it")
    require(m.get._1 == family,
      s"media hash index at $root was built by pipeline family " +
        s"'${m.get._1}', refusing to touch it as '$family' — " +
        "cross-family hashes pair to garbage")
    m.get._2
  }

  /** Stage a (media_id, h) frame as the hash-sharded artifact tree with
    * `_meta` inside it (publishing atomically with the data): one
    * exchange on the shard key so each dir is written once, h sort
    * within for row-group min/max locality on the band join's probe
    * side.
    */
  private def writeSharded(hashed: DataFrame, path: String,
      family: String, shards: Int): Unit = {
    hashed
      .withColumn("shard", shardOf(col("h"), shards))
      .repartition(col("shard"))
      .sortWithinPartitions("h", "media_id")
      .write.partitionBy("shard")
      .option("compression", "zstd")
      .parquet(path)
    // the meta lands INSIDE the staged tree so it rides the publish
    // rename with the data it describes
    java.nio.file.Files.write(new File(path, "_meta").toPath,
      s"family=$family\nshards=$shards\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }

  /** Build (or rebuild) the artifact under `root` from a hashed
    * (media_id, h) frame. Rebuilds publish through the aside-rename
    * chain — a crash leaves the previous servable artifact or a
    * recoverable aside, never a torn tree; and a rebuild must not
    * silently flip the pipeline family under a reader.
    */
  def buildInto(root: String, hashed: DataFrame, family: String,
      shards: Int = shardCount): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    new File(root).mkdirs()
    recover(root)
    if (new File(hashesDir(root)).exists()) metaOf(root).foreach {
      case (f, s) => require(f == family && s == shards,
        s"media hash index at $root was built as family=$f shards=$s, " +
          s"refusing to rebuild as family=$family shards=$shards — " +
          "cross-family hashes pair to garbage")
    }
    val stage = s"${hashesDir(root)}.tmp-${java.util.UUID.randomUUID()}"
    writeSharded(hashed, stage, family, shards)
    if (new File(hashesDir(root)).exists())
      Artifacts.publishByRename(hashesDir(root), stage)
    else require(new File(stage).renameTo(new File(hashesDir(root))),
      s"publish rename to ${hashesDir(root)} failed")
  }

  /** Fold a NEW hashed slice in: keyed by the artifact's own `_meta`
    * shard scheme, landing as one file per touched shard dir — the
    * corpus is never re-read or re-decoded (slice-sized work, the whole
    * point of the artifact). Replay-safe by value: duplicate rows,
    * never duplicate pairs (serving dedupes, compaction collapses).
    */
  def appendTo(root: String, newHashed: DataFrame, family: String): Unit = {
    require(new File(hashesDir(root)).exists(),
      s"appendTo on $root with no hashes/ — build or recover first")
    val shards = requireMeta(root, family)
    newHashed
      .withColumn("shard", shardOf(col("h"), shards))
      // bound the append's file count explicitly (the WinnowIndex
      // rationale): one pre-write partition → one file per touched shard
      .repartition(1)
      .sortWithinPartitions("shard", "h")
      .write.mode("append").partitionBy("shard")
      .option("compression", "zstd")
      .parquet(hashesDir(root))
  }

  /** Collapse appended segments globally: one distinct, h-sorted file
    * per shard — same (media_id, h) SET, restored file economy.
    * Publishes through the shared crash-recoverable rename chain.
    */
  def compact(root: String, spark: SparkSession, family: String): Unit = {
    recover(root)
    val shards = requireMeta(root, family)
    // a degenerate artifact (empty documents) holds no shard dirs —
    // nothing to collapse, and a parquet read over zero files would
    // fail schema inference rather than no-op
    if (segments(root) == 0) return
    val merged = spark.read.parquet(hashesDir(root))
      .select("media_id", "h")
      .dropDuplicates("media_id", "h")
    val tmp = s"${hashesDir(root)}.tmp-${java.util.UUID.randomUUID()}"
    writeSharded(merged, tmp, family, shards)
    Artifacts.publishByRename(hashesDir(root), tmp)
  }

  /** SHARD-LOCAL compaction — the WinnowIndex/TextIndex/VectorIndex
    * pattern at hash-shard grain: every `shard=` dir whose segment-file
    * count exceeds `maxSegments` is rewritten alone (deduped, h-sorted,
    * one file) in ONE job over exactly the overweight dirs, each swapped
    * in atomically at SHARD-DIR grain through the shared
    * [[Artifacts.swapStagedDirs]] chain. The shard key is a pure
    * function of h, so a per-shard distinct is the global dedup
    * restricted to that slice — the rewritten set is preserved exactly
    * while untouched dirs keep their (value-idempotent, serving-deduped)
    * segments. This is what a continuous maintainer runs per batch.
    */
  def compactShards(root: String, spark: SparkSession, family: String,
      maxSegments: Int = 1): Unit = {
    recover(root)
    requireMeta(root, family): Unit
    val dirs = Artifacts.overweightDirs(hashesDir(root), "shard=", maxSegments)
    if (dirs.isEmpty) return
    // ONE job over exactly the overweight dirs (basePath keeps the
    // shard partition column so the rewrite re-lands per dir); the
    // staged root's own _meta is staging residue the stage sweep
    // removes — the live tree keeps its marker
    val stage = s"${hashesDir(root)}.tmp-${java.util.UUID.randomUUID()}"
    spark.read.option("basePath", hashesDir(root))
      .parquet(dirs.map(_.getPath).toSeq: _*)
      .select("media_id", "h", "shard")
      .dropDuplicates("media_id", "h")
      .repartition(col("shard"))
      .sortWithinPartitions("h", "media_id")
      .write.partitionBy("shard")
      .option("compression", "zstd")
      .parquet(stage)
    Artifacts.swapStagedDirs(spark, stage, dirs.toSeq)
  }

  /** Heal a crashed swap — whole-tree ([[compact]]/rebuild) at the
    * hashes grain, and any crashed SHARD-dir swaps ([[compactShards]])
    * inside it. Call at maintenance entry; single-maintainer-per-root
    * is the concurrency contract.
    */
  def recover(root: String): Unit = {
    Artifacts.recoverArtifacts(root, Seq("hashes"))
    if (new File(hashesDir(root)).isDirectory)
      Artifacts.recoverDirSwaps(hashesDir(root), "shard=")
  }

  /** MAX parquet file count across shard dirs — the shared segment
    * proxy a streaming maintainer bounds.
    */
  private[graft] def segments(root: String): Int =
    Artifacts.maxSegmentsIn(hashesDir(root), "shard=")

  /** TOTAL parquet file count across shard dirs — the whole-tree growth
    * witness [[ensure]]'s append proof uses (the per-dir max is blind
    * to appends landing only in previously empty dirs).
    */
  private def totalFiles(root: String): Int =
    Artifacts.totalSegmentsIn(hashesDir(root), "shard=")

  /** The serving residue gate (the family-wide r12 rule): a crashed
    * [[compactShards]] swap leaves `shard=N` missing with
    * `shard=N.old-<uuid>` present, and partition discovery would parse
    * the aside's name as a STRING partition value — this artifact is
    * read whole (no isin prune), so the rows would still load, but the
    * widened string shard column poisons any downstream partition
    * arithmetic and the tree is mid-maintenance by definition. Refuse
    * loudly (after the bounded patience for a HEALTHY concurrent
    * swap's transient aside); maintenance heals.
    */
  private def requireNoShardResidue(root: String): Unit = {
    val residue = Artifacts.settledDirResidue(hashesDir(root), "shard=")
    require(residue.isEmpty,
      s"media hash index at $root holds crashed shard-compaction residue " +
        s"(${residue.sorted.mkString(", ")}) — run a maintenance entry " +
        "(recover/compact) to heal before serving")
  }

  /** The serving load: the artifact's (media_id, h) rows, deduped
    * against replayed append segments, family-gated and
    * residue-refusing. Exactly the frame
    * [[MultimodalOps.dhashBandPairs]]/[[MultimodalOps.dhashBandJoin]]
    * consume.
    */
  private[graft] def load(spark: SparkSession, root: String,
      family: String): DataFrame = {
    requireMeta(root, family): Unit
    requireNoShardResidue(root)
    if (segments(root) == 0) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("media_id", LongType),
          StructField("h", LongType))))
    }
    spark.read.parquet(hashesDir(root))
      .select("media_id", "h")
      .dropDuplicates("media_id", "h")
  }

  /** Per-dataset artifact root, keyed by the dataset fingerprint and
    * the modality (`v1` = this layout; a format change keys a fresh
    * root, never a half-migrated one).
    */
  private[graft] def indexPath(dir: String, modality: Modality): String =
    Artifacts.datasetRoot(dir, "documents", s"media_hash_v1_${modality.name}")

  /** Build-if-missing over the dataset's documents (ingest-time —
    * `SparkEntry.prepare`); the two-JVM-safe [[Artifacts.ensureRoot]]
    * publish. Built the way production MAINTAINS the artifact (the
    * `VectorIndex.ensureExactSig` / `WinnowIndex.ensure` twin): a
    * deterministic prefix of the corpus ([[buildInto]] over
    * doc_id % 5 ≠ 1), the remainder folded in with [[appendTo]] (keyed
    * by the artifact's own `_meta`, slice-sized), then BOTH compaction
    * entries. Hashes are per-document VALUES (a pure function of
    * content), so the maintained set equals a full rebuild's exactly —
    * the indexed near-dup twins' spec pins ([[MediaHashIndexSpec]])
    * therefore certify the append+compact maintenance chain itself, not
    * just the build path; the in-builder segment requires make the
    * exercise structural (a skipped append or compact fails prepare
    * loudly).
    */
  def ensure(spark: SparkSession, dir: String, modality: Modality): String =
    Artifacts.ensureRoot(indexPath(dir, modality))(p =>
      new File(s"${hashesDir(p)}/_SUCCESS").exists() &&
        metaOf(p).exists(_._1 == modality.family)) { tmp =>
      val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
      val prefix = docs.filter(col("doc_id") % 5 =!= 1)
      val rest = docs.filter(col("doc_id") % 5 === 1)
      buildInto(tmp, modality.hashesOf(prefix), modality.family)
      // every structural require below is guarded by its slice hashing
      // to nothing (empty table / all-null text) — a degenerate dataset
      // must still build a servable empty artifact, never strand
      // prepare behind a proof about work that did not exist; the
      // guards only evaluate on the failure path (|| short-circuits)
      // and each decode pass is paid AT MOST ONCE (lazy + cached),
      // never re-run per trip (review-found, r13 ADVICE)
      lazy val prefixEmpty = modality.hashesOf(prefix).isEmpty
      lazy val restEmpty = modality.hashesOf(rest).isEmpty
      val segsAfterBuild = segments(tmp)
      require(segsAfterBuild == 1 || prefixEmpty,
        s"media hash prefix build left $segsAfterBuild segments, expected 1")
      val filesAfterBuild = totalFiles(tmp)
      appendTo(tmp, modality.hashesOf(rest), modality.family)
      // the append lands one file PER TOUCHED SHARD DIR, and the slice
      // may hash entirely into dirs the prefix build left EMPTY — so
      // the structural proof is that the TREE's file count grew, not
      // that the per-dir MAX incremented (the max stays flat when every
      // touched dir got its first file, spuriously failing a correct
      // artifact) (review-found, r13 ADVICE)
      require(totalFiles(tmp) > filesAfterBuild || restEmpty,
        "media hash append added no files — the maintenance path " +
          "this artifact exists to prove was not exercised")
      // BOTH compaction entries run, so the indexed twins stand behind
      // each: shard-local first (the streaming maintainer's per-batch
      // path), then the global collapse
      compactShards(tmp, spark, modality.family)
      require(segments(tmp) == 1 || (prefixEmpty && restEmpty),
        s"media hash shard-local compact left ${segments(tmp)} segments, expected 1")
      compact(tmp, spark, modality.family)
      require(segments(tmp) == 1 || (prefixEmpty && restEmpty),
        s"media hash compact left ${segments(tmp)} segments, expected 1")
    }

  /** Image perceptual near-dup SERVED FROM THE MAINTAINED ARTIFACT —
    * the ingest-amortized face of [[MultimodalOps.imageNearDup]] (same
    * banded equi-join, same exact Hamming confirm, same pigeonhole
    * recall guarantee), reading 16-byte (media_id, h) rows instead of
    * re-running container-build + decode + hash over the corpus.
    * Rows-only driver check (the hash is packing/codec-defined);
    * MediaHashIndexSpec pins indexed ≡ recompute on the full corpus.
    */
  def imageNearDupIndexed(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val root = ensure(spark, dir, Image)
    MultimodalOps.dhashBandPairs(load(spark, root, Image.family),
      bands = 4, maxHamming = maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** [[imageNearDupIndexed]] at the audio modality — the
    * ingest-amortized face of [[MultimodalOps.audioNearDup]].
    */
  def audioNearDupIndexed(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val root = ensure(spark, dir, Audio)
    MultimodalOps.dhashBandPairs(load(spark, root, Audio.family),
      bands = 4, maxHamming = maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
