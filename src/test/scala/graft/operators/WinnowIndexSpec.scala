package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.streaming.WinnowStream

/** Maintained winnow-fingerprint artifact: serving from the artifact
  * must equal a full one-shot rebuild across an append AND a
  * compaction; crashed compaction swaps heal; cross-family use fails
  * fast.
  */
class WinnowIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def docs() = graft.Tables.documents(spark, dir)
    .select(col("doc_id").cast("long"), col("text"))

  /** Match-report rows for `probe` docs against a fingerprint frame —
    * the serving kernel both sides run.
    */
  private def report(probe: org.apache.spark.sql.DataFrame,
      fps: org.apache.spark.sql.DataFrame): Set[String] =
    WinnowStream.matchReport(probe, fps.select("fp").distinct())
      .collect().map(_.toString).toSet

  test("artifact serving equals a full rebuild across an append and a compaction") {
    val d = docs()
    val root = java.nio.file.Files.createTempDirectory("graft-widx").toString
    val probe = d.limit(60)
    // base: 2/3 of the corpus
    WinnowIndex.buildInto(root, d.filter(col("doc_id") % 3 =!= 0))
    // append the remaining slice — artifact must now serve EXACTLY like
    // a rebuild over everything
    WinnowIndex.appendTo(root, d.filter(col("doc_id") % 3 === 0))
    val full = WinnowStream.corpusIndexOf(d)
    val fromArtifact = spark.read.parquet(WinnowIndex.fpsDir(root))
    assert(report(probe, fromArtifact) === report(probe, full))
    // fingerprint SETS are identical too (not just report-equal)
    assert(fromArtifact.select("fp").distinct().collect().map(_.getLong(0)).sorted
      === full.collect().map(_.getLong(0)).sorted)
    // the PRUNED membership read (r10 range sharding) serves the same
    // report: pruning can never drop a hit — a matching fp shares the
    // probe fp's shard by construction
    val probeSel = TextOps.winnowOver(probe, 3, 4)
      .select("doc_id", "fp").distinct()
    val pruned = WinnowIndex.membershipFps(spark, root, probeSel)
    assert(TextOps.winnowMatchReportFromSel(probe, probeSel, pruned)
      .collect().map(_.toString).toSet === report(probe, full))
    // compaction: same set, segment count collapses
    val before = WinnowIndex.segments(root)
    assert(before >= 2, s"append should add segments, saw $before")
    WinnowIndex.compact(root, spark)
    spark.catalog.refreshByPath(WinnowIndex.fpsDir(root))
    val compacted = spark.read.parquet(WinnowIndex.fpsDir(root))
    assert(report(probe, compacted) === report(probe, full))
    assert(WinnowIndex.segments(root) < before)
  }

  test("range sharding: shard dirs match the manifest's equi-depth cut; a " +
      "single-shard probe reads only fps inside its range; shards balance") {
    val d = docs().filter(col("doc_id") % 4 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-widxs").toString
    WinnowIndex.buildInto(root, d)
    val bounds = WinnowIndex.boundsOf(root, TextOps.WinnowMd5)
    def shardOf(fp: Long): Int = bounds.count(_ <= fp)
    // every persisted fp sits in the shard dir the manifest's cut names
    val rows = spark.read.parquet(WinnowIndex.fpsDir(root))
      .select("fp", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (fp, s) =>
      assert(s == shardOf(fp), s"fp $fp in dir shard=$s, manifest says ${shardOf(fp)}")
    }
    // equi-depth: winnow fps are window MINIMA (head-heavy values), so
    // the quantile cut — not fixed-width ranges — is what balances
    // shard populations; the heaviest shard stays within a small factor
    // of the mean
    val sizes = rows.groupBy(_._2).map(_._2.size)
    val mean = rows.length.toDouble / WinnowIndex.shardCount
    assert(sizes.max <= mean * 3,
      s"heaviest shard ${sizes.max} vs mean $mean — cut is not equi-depth")
    // a probe holding ONE fp prunes to exactly that fp's shard: the
    // membership set equals the artifact's fps in that range, nothing else
    val (oneFp, oneShard) = rows.head
    val probeFps = Seq((0L, oneFp)).toDF("doc_id", "fp")
    val got = WinnowIndex.membershipFps(spark, root, probeFps)
      .collect().map(_.getLong(0)).toSet
    val want = rows.filter(_._2 == oneShard).map(_._1).toSet
    assert(got === want, s"pruned set diverges for shard $oneShard")
  }

  test("manifest validation: unmarked roots, scheme drift and torn files " +
      "refuse pruned serving with the actionable message") {
    val d = docs().filter(col("doc_id") % 4 === 1)
    val root = java.nio.file.Files.createTempDirectory("graft-widxm").toString
    WinnowIndex.buildInto(root, d)
    val probeFps = Seq((0L, 123L)).toDF("doc_id", "fp")
    // manifest torn/absent (a pre-v3 artifact): pruned serving must fail
    // fast, never silently under-read
    val mf = new java.io.File(WinnowIndex.fpsDir(root), "_manifest")
    val body = java.nio.file.Files.readAllBytes(mf.toPath)
    assert(mf.delete())
    intercept[IllegalArgumentException] {
      WinnowIndex.membershipFps(spark, root, probeFps)
    }
    // scheme drift (different shard count / version) is refused too
    java.nio.file.Files.write(mf.toPath,
      "version=2\nshards=8\nfamily=md5-60bit\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      WinnowIndex.membershipFps(spark, root, probeFps)
    }
    // a HALF-WRITTEN manifest (crash mid-write) must produce the same
    // actionable refusal, never a raw parse error
    java.nio.file.Files.write(mf.toPath,
      "version=3\nshards=64\nfamily=md5-60bit\nbound=12\nbound=".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      WinnowIndex.membershipFps(spark, root, probeFps)
    }
    assert(e.getMessage.contains("refusing to prune"), e.getMessage)
    // restored manifest serves again
    java.nio.file.Files.write(mf.toPath, body)
    assert(WinnowIndex.membershipFps(spark, root, probeFps).count() >= 0)
  }

  test("a crash between compaction's aside and swap-in renames heals on recover") {
    val d = docs().filter(col("doc_id") % 5 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-widxh").toString
    WinnowIndex.buildInto(root, d)
    val want = spark.read.parquet(WinnowIndex.fpsDir(root))
      .collect().map(_.getLong(0)).sorted
    // simulate the crash point: fps renamed aside, swap-in never ran
    val fps = new java.io.File(WinnowIndex.fpsDir(root))
    val aside = new java.io.File(WinnowIndex.fpsDir(root) + ".old-crashed")
    assert(fps.renameTo(aside))
    WinnowIndex.recover(root)
    assert(fps.exists() && !aside.exists())
    spark.catalog.refreshByPath(WinnowIndex.fpsDir(root))
    assert(spark.read.parquet(WinnowIndex.fpsDir(root))
      .collect().map(_.getLong(0)).sorted === want)
  }

  test("cross-family maintenance and serving fail fast") {
    val d = docs().filter(col("doc_id") % 5 === 1)
    val root = java.nio.file.Files.createTempDirectory("graft-widxf").toString
    WinnowIndex.buildInto(root, d, family = TextOps.WinnowMd5)
    assert(WinnowIndex.familyOf(root).contains("md5-60bit"))
    intercept[IllegalArgumentException] {
      WinnowIndex.appendTo(root, d, family = TextOps.WinnowXx)
    }
    intercept[IllegalArgumentException] {
      WinnowIndex.buildInto(root, d, family = TextOps.WinnowXx)
    }
    // the serving check runs in the refresh LOADER (per refresh, not at
    // construction), so a cross-family index fails the stream's first
    // batch loudly instead of silently matching nothing
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = WinnowStream.matchesVsIndexRefreshing(
      mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text")), root,
      refreshEvery = 1, family = TextOps.WinnowXx)((_, _) => ()).start()
    try {
      mem.addData((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(t =>
        Option(t.getMessage).exists(_.contains("refusing to serve"))), e.toString)
    } finally q.stop()
  }

  test("ensure keys the artifact by (k, w): different parameters build siblings") {
    // a parameter change must never silently serve the first builder's
    // fingerprints — (5, 8) selections are meaningless against (3, 4)'s
    val rootA = WinnowIndex.ensure(spark, dir, k = 3, w = 4)
    val rootB = WinnowIndex.ensure(spark, dir, k = 5, w = 8)
    assert(rootA != rootB, "distinct (k, w) must key distinct artifacts")
    val fpsA = spark.read.parquet(WinnowIndex.fpsDir(rootA))
      .collect().map(_.getLong(0)).toSet
    val fpsB = spark.read.parquet(WinnowIndex.fpsDir(rootB))
      .collect().map(_.getLong(0)).toSet
    assert(fpsA.nonEmpty && fpsB.nonEmpty && fpsA != fpsB,
      "sibling artifacts must hold their own parameter tier's selections")
    // idempotent re-entry serves the committed sibling, no rebuild
    assert(WinnowIndex.ensure(spark, dir, k = 3, w = 4) == rootA)
  }

  test("shard-local compaction: only overweight dirs rewrite, the cut and the " +
      "fingerprint set are untouched, and a crashed shard swap heals") {
    val d = docs()
    val root = java.nio.file.Files.createTempDirectory("graft-widxsl").toString
    WinnowIndex.buildInto(root, d.filter(col("doc_id") % 3 === 0))
    WinnowIndex.appendTo(root, d.filter(col("doc_id") % 3 === 1))
    WinnowIndex.appendTo(root, d.filter(col("doc_id") % 3 === 2))
    assert(WinnowIndex.segments(root) == 3)
    val boundsBefore = WinnowIndex.boundsOf(root, TextOps.WinnowMd5)
    val wantFps = spark.read.parquet(WinnowIndex.fpsDir(root))
      .select("fp").distinct().collect().map(_.getLong(0)).toSet
    // single-file dirs must NOT rewrite: record their file identities
    val fpsRoot = new java.io.File(WinnowIndex.fpsDir(root))
    def filesOf(dir: java.io.File): Set[String] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val single = fpsRoot.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=") &&
        filesOf(f).size == 1)
      .map(f => f.getName -> filesOf(f)).toMap
    WinnowIndex.compactShards(root, spark)
    assert(WinnowIndex.segments(root) == 1)
    // cut untouched (shard-local compaction never rebalances)...
    assert(WinnowIndex.boundsOf(root, TextOps.WinnowMd5) == boundsBefore)
    // ...set preserved exactly...
    spark.catalog.refreshByPath(WinnowIndex.fpsDir(root))
    assert(spark.read.parquet(WinnowIndex.fpsDir(root))
      .select("fp").distinct().collect().map(_.getLong(0)).toSet === wantFps)
    // ...and dirs already at one file kept their very files (no
    // corpus-wide rewrite hiding behind the shard-local claim)
    single.foreach { case (name, files) =>
      assert(filesOf(new java.io.File(fpsRoot, name)) == files,
        s"$name was rewritten though it was not overweight")
    }
    // crash point: a shard dir renamed aside with its swap-in never run
    val victim = fpsRoot.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .maxBy(f => filesOf(f).size)
    val aside = new java.io.File(fpsRoot, victim.getName + ".old-crashed")
    assert(victim.renameTo(aside))
    WinnowIndex.recover(root)
    assert(victim.exists() && !aside.exists())
    spark.catalog.refreshByPath(WinnowIndex.fpsDir(root))
    assert(spark.read.parquet(WinnowIndex.fpsDir(root))
      .select("fp").distinct().collect().map(_.getLong(0)).toSet === wantFps)
  }

  test("shard count is a build parameter the manifest carries: a 512-shard " +
      "artifact serves, prunes, and compacts at its own width") {
    val d = docs().filter(col("doc_id") % 2 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-widxw").toString
    WinnowIndex.buildInto(root, d, shards = 512)
    val bounds = WinnowIndex.boundsOf(root, TextOps.WinnowMd5)
    assert(bounds.length == 511)
    // serving equality: the wide artifact holds exactly the corpus set
    val want = TextOps.winnowOver(d, 3, 4).select("fp").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(spark.read.parquet(WinnowIndex.fpsDir(root))
      .select("fp").collect().map(_.getLong(0)).toSet === want)
    // pruning at the wide cut: a 1-fp probe reads only its own shard's
    // range — a far smaller slice than the 64-shard default's
    val oneFp = want.head
    val probeFps = Seq((0L, oneFp)).toDF("doc_id", "fp")
    val pruned = WinnowIndex.membershipFps(spark, root, probeFps)
      .collect().map(_.getLong(0)).toSet
    def shardOf(fp: Long): Int = bounds.count(_ <= fp)
    assert(pruned === want.filter(fp => shardOf(fp) == shardOf(oneFp)))
    // append + compact preserve the artifact's OWN width across the
    // re-cut (the manifest is the authority, not the default constant)
    WinnowIndex.appendTo(root, docs().filter(col("doc_id") % 2 =!= 0))
    WinnowIndex.compact(root, spark)
    assert(WinnowIndex.boundsOf(root, TextOps.WinnowMd5).length == 511)
    spark.catalog.refreshByPath(WinnowIndex.fpsDir(root))
    val wantAll = TextOps.winnowOver(docs(), 3, 4).select("fp").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(spark.read.parquet(WinnowIndex.fpsDir(root))
      .select("fp").collect().map(_.getLong(0)).toSet === wantAll)
  }

  test("crashed shard-compaction residue refuses pruned serving loudly and " +
      "heals on recover") {
    // the r12 ADVICE window: compactShards crashed between the
    // aside-rename and the swap-in, leaving shard=N missing with
    // shard=N.old-<uuid> present — partition discovery would parse the
    // aside as a STRING partition value, so an isin prune would silently
    // drop that shard's fingerprints. Pruned serving must refuse, not
    // under-match.
    val d = docs().filter(col("doc_id") % 7 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-widxr").toString
    WinnowIndex.buildInto(root, d)
    val fpsRoot = new java.io.File(WinnowIndex.fpsDir(root))
    val rows = spark.read.parquet(WinnowIndex.fpsDir(root))
      .select("fp", "shard").collect().map(r => (r.getLong(0), r.getInt(1)))
    val (oneFp, _) = rows.head
    val probeFps = Seq((0L, oneFp)).toDF("doc_id", "fp")
    val want = WinnowIndex.membershipFps(spark, root, probeFps)
      .collect().map(_.getLong(0)).toSet
    // crash point: a populated shard dir renamed aside, swap-in never ran
    val victim = fpsRoot.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .maxBy(f => Option(f.listFiles()).map(_.length).getOrElse(0))
    val aside = new java.io.File(fpsRoot, victim.getName + ".old-crashed")
    assert(victim.renameTo(aside))
    val e = intercept[IllegalArgumentException] {
      WinnowIndex.membershipFps(spark, root, probeFps)
    }
    assert(e.getMessage.contains("residue"), e.getMessage)
    // stale .tmp- staging residue refuses too
    WinnowIndex.recover(root)
    val tmpDir = new java.io.File(fpsRoot, "shard=999.tmp-stale")
    assert(tmpDir.mkdir())
    val e2 = intercept[IllegalArgumentException] {
      WinnowIndex.membershipFps(spark, root, probeFps)
    }
    assert(e2.getMessage.contains("residue"), e2.getMessage)
    assert(tmpDir.delete())
    // healed tree serves the identical set again
    spark.catalog.refreshByPath(WinnowIndex.fpsDir(root))
    assert(WinnowIndex.membershipFps(spark, root, probeFps)
      .collect().map(_.getLong(0)).toSet === want)
  }

  test("a degenerate (empty) dataset still ensures a servable empty artifact") {
    // empty corpus → no fingerprints anywhere: ensure must build a
    // valid empty artifact (the maintenance-proof requires are about
    // work that existed), and membership serving must return the empty
    // set instead of failing schema inference over zero files
    val ds = java.nio.file.Files.createTempDirectory("graft-widxe").toString
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.parquet(s"$ds/documents.parquet")
    val root = WinnowIndex.ensure(spark, ds)
    assert(new java.io.File(s"${WinnowIndex.fpsDir(root)}/_SUCCESS").exists())
    assert(WinnowIndex.segments(root) == 0)
    val probeFps = Seq((0L, 123L)).toDF("doc_id", "fp")
    assert(WinnowIndex.membershipFps(spark, root, probeFps).count() == 0)
  }

  test("an xxhash64-tier index round-trips build/append/serve") {
    val d = docs()
    val root = java.nio.file.Files.createTempDirectory("graft-widxx").toString
    val probe = d.limit(40)
    WinnowIndex.buildInto(root, d.filter(col("doc_id") % 2 === 0),
      family = TextOps.WinnowXx)
    WinnowIndex.appendTo(root, d.filter(col("doc_id") % 2 =!= 0),
      family = TextOps.WinnowXx)
    val full = WinnowStream.corpusIndexOf(d, family = TextOps.WinnowXx)
    val art = spark.read.parquet(WinnowIndex.fpsDir(root))
    val got = WinnowStream.matchReport(probe, art.select("fp").distinct(),
      family = TextOps.WinnowXx).collect().map(_.toString).toSet
    val want = WinnowStream.matchReport(probe, full,
      family = TextOps.WinnowXx).collect().map(_.toString).toSet
    assert(got.nonEmpty && got === want)
  }
}
