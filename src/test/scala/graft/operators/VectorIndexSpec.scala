package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Maintained LSH bucket-list artifact: maintenance (build → append →
  * compact) must converge bit-for-bit on the full rebuild's survivor
  * set — including when the per-bucket cap actively truncates — and the
  * meta/crash gates must fail fast rather than serve drifted codes or a
  * torn tree.
  */
class VectorIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  graft.functions.VectorFunctions.ensureRegistered(spark)

  private def embAll() = graft.Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding"))

  private def withNrm(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(
      col("embedding"), col("embedding"))))

  private def keys(df: org.apache.spark.sql.DataFrame): Set[(Int, Int, Long)] =
    df.select(col("t").cast("int"), col("bucket").cast("int"), col("nid"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

  test("build + append + compact converges on the full rebuild's survivor set " +
      "under an actively truncating cap") {
    val (maxBucket, bits) = (4, 6) // tiny cap + narrow codes → real truncation
    val all = embAll()
    val a = all.filter(col("vec_id") % 3 =!= 0)
    val b = all.filter(col("vec_id") % 3 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-vidx").toString
    VectorIndex.buildInto(root, a, maxBucket, bits)
    VectorIndex.appendTo(root, b)
    val rebuilt = keys(VectorOps.lshIndex(withNrm(all), maxBucket, bits))
    // the cap truly binds in this configuration, else the test is vacuous
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root))).size <
      keys(VectorOps.lshIndex(withNrm(all), Int.MaxValue, bits)).size)
    // BETWEEN compactions the artifact over-holds (per-slice caps): a
    // SUPERSET of the rebuild's survivors — candidates cost work, never
    // recall (the global smallest-k members are kept by their slice's cap)
    val staged = keys(spark.read.parquet(VectorIndex.indexDir(root)))
    assert(rebuilt.subsetOf(staged), s"missing ${(rebuilt -- staged).take(5)}")
    // compaction re-caps globally → EXACTLY the rebuild's survivor set
    VectorIndex.compact(root, spark)
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root))) === rebuilt)
    // and the serving load (deduped, renamed) carries the same keys
    val (served, servedBits, servedCoder) = VectorIndex.load(spark, root)
    assert(servedBits == bits)
    assert(servedCoder == "float")
    assert(served.select(col("t"), col("bucket"), col("corpus_vec").as("nid"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet === rebuilt)
  }

  test("a replayed append adds duplicate rows, never duplicate survivors") {
    val (maxBucket, bits) = (4, 6)
    val all = embAll()
    val a = all.filter(col("vec_id") % 2 === 0)
    val b = all.filter(col("vec_id") % 2 =!= 0)
    val root = java.nio.file.Files.createTempDirectory("graft-vidxr").toString
    VectorIndex.buildInto(root, a, maxBucket, bits)
    VectorIndex.appendTo(root, b)
    VectorIndex.appendTo(root, b) // the at-least-once re-delivery
    val rebuilt = keys(VectorOps.lshIndex(withNrm(all), maxBucket, bits))
    // serving dedupes the replay's rows
    val (served, _, _) = VectorIndex.load(spark, root)
    val servedKeys = served
      .select(col("t"), col("bucket"), col("corpus_vec").as("nid"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(servedKeys.length == servedKeys.toSet.size, "served duplicates")
    // and compaction collapses them into exactly the rebuild's set
    VectorIndex.compact(root, spark)
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root))) === rebuilt)
  }

  test("segments: appends add one file per table dir; compaction collapses them") {
    val root = java.nio.file.Files.createTempDirectory("graft-vidxs").toString
    val all = embAll()
    VectorIndex.buildInto(root, all.filter(col("vec_id") % 3 === 0), 64, 6)
    assert(VectorIndex.segments(root) == 1)
    VectorIndex.appendTo(root, all.filter(col("vec_id") % 3 === 1))
    VectorIndex.appendTo(root, all.filter(col("vec_id") % 3 === 2))
    assert(VectorIndex.segments(root) == 3)
    VectorIndex.compact(root, spark)
    assert(VectorIndex.segments(root) == 1)
  }

  test("meta gates: width drift and unmarked roots fail fast") {
    val root = java.nio.file.Files.createTempDirectory("graft-vidxm").toString
    val a = embAll().filter(col("vec_id") % 5 === 0)
    VectorIndex.buildInto(root, a, 64, 6)
    // a rebuild must not silently flip the code space
    intercept[IllegalArgumentException] {
      VectorIndex.buildInto(root, a, 64, 8)
    }
    intercept[IllegalArgumentException] {
      VectorIndex.buildInto(root, a, 32, 6)
    }
    // a TORN in-tree _meta (crash mid-write) produces the actionable
    // refusal, never a raw parse error
    val metaPath = new java.io.File(s"$root/index", "_meta")
    java.nio.file.Files.write(metaPath.toPath, "bits=6\nmaxBuc".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] { VectorIndex.load(spark, root) }
    assert(e.getMessage.contains("rebuild it"), e.getMessage)
    // an unmarked index cannot prove its width: serving and appends refuse
    assert(metaPath.delete())
    intercept[IllegalArgumentException] { VectorIndex.load(spark, root) }
    intercept[IllegalArgumentException] { VectorIndex.appendTo(root, a) }
  }

  test("a pre-r14 artifact (no model fingerprint in _meta) is healed by " +
      "recover's one-time backfill — maintenance resumes instead of " +
      "stranding the stream maintainer behind the cascade refusal") {
    val root = java.nio.file.Files.createTempDirectory("graft-vidxleg").toString
    val a = embAll().filter(col("vec_id") % 5 === 1)
    VectorIndex.buildInto(root, a, maxBucket = 64, bits = 6)
    // simulate the pre-r14 meta: strip the model line
    val metaPath = new java.io.File(s"$root/index", "_meta")
    val legacyBody = new String(java.nio.file.Files.readAllBytes(
      metaPath.toPath), "UTF-8").linesIterator
      .filterNot(_.startsWith("model=")).mkString("", "\n", "\n")
    java.nio.file.Files.write(metaPath.toPath, legacyBody.getBytes("UTF-8"))
    // without recover, the gate refuses (the cascade posture)
    val e = intercept[IllegalArgumentException] {
      VectorIndex.load(spark, root)
    }
    assert(e.getMessage.contains("cascade"), e.getMessage)
    // the maintenance entry backfills the CURRENT fingerprint (sound:
    // the code space never moved without a coder bump) and serving and
    // appends resume
    VectorIndex.recover(root)
    assert(VectorIndex.modelOf(root)
      .contains(VectorIndex.modelFpFor(VectorIndex.coderFloat)))
    assert(VectorIndex.load(spark, root)._1.count() > 0)
    VectorIndex.appendTo(root, embAll().filter(col("vec_id") % 5 === 3))
  }

  test("a torn artifact (unreadable in-tree meta) refuses every reader and " +
      "heals by rebuild at ANY parameters — meta publishes with its data") {
    val root = java.nio.file.Files.createTempDirectory("graft-vidxc").toString
    val a = embAll().filter(col("vec_id") % 5 === 2)
    VectorIndex.buildInto(root, a, maxBucket = 64, bits = 6)
    // crash residue: the in-tree meta is torn — no reader can serve, so
    // the artifact is TORN as a unit (the meta can never describe a
    // different code space than the tree it sits in)
    java.nio.file.Files.write(
      new java.io.File(s"$root/index", "_meta").toPath,
      "bits=".getBytes("UTF-8"))
    intercept[IllegalArgumentException] { VectorIndex.load(spark, root) }
    // the remedy is a rebuild — at ANY parameters, since nothing is
    // servable to drift under a reader
    VectorIndex.buildInto(root, a, maxBucket = 32, bits = 8)
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    assert(VectorIndex.requireMeta(root) == ((8, 32, "float")))
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root))) ===
      keys(VectorOps.lshIndex(withNrm(a), 32, 8)))
    // with a LIVE readable index the drift gate still holds
    intercept[IllegalArgumentException] {
      VectorIndex.buildInto(root, a, maxBucket = 32, bits = 6)
    }
  }

  test("exactsig coder: maintenance runs the artifact's own code family " +
      "and converges on its rebuild; coder drift is refused") {
    val all = embAll()
    val a = all.filter(col("vec_id") % 3 =!= 0)
    val b = all.filter(col("vec_id") % 3 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-vidxe").toString
    VectorIndex.buildInto(root, a, maxBucket = 100000, bits = 8,
      coder = VectorIndex.coderExactSig)
    assert(VectorIndex.requireMeta(root) == ((8, 100000, "exactsig4")))
    // appendTo must code the slice in the ARTIFACT's family (from meta),
    // so the merged artifact equals the exactsig rebuild over everything
    VectorIndex.appendTo(root, b)
    VectorIndex.compact(root, spark)
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    val rebuilt = keys(VectorOps.capBuckets(
      VectorOps.exactSigEntries(withNrm(all), 4, 8), 100000))
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root))) === rebuilt)
    // a rebuild in ANOTHER family over the live artifact is refused
    intercept[IllegalArgumentException] {
      VectorIndex.buildInto(root, a, maxBucket = 100000, bits = 8)
    }
  }

  test("a root built before the in-tree meta move keeps serving: recover " +
      "migrates the root-level _meta in, and deletes disowned residue") {
    val root = java.nio.file.Files.createTempDirectory("graft-vidxl").toString
    val a = embAll().filter(col("vec_id") % 5 === 3)
    VectorIndex.buildInto(root, a, maxBucket = 64, bits = 6)
    val want = keys(spark.read.parquet(VectorIndex.indexDir(root)))
    // rewind to the pre-move layout: the marker at root level, none in-tree
    val inTree = new java.io.File(s"$root/index", "_meta")
    val legacy = new java.io.File(root, "_meta")
    assert(inTree.renameTo(legacy))
    intercept[IllegalArgumentException] { VectorIndex.load(spark, root) }
    // maintenance entry migrates it — the artifact serves, same entries
    VectorIndex.recover(root)
    assert(inTree.exists() && !legacy.exists())
    assert(VectorIndex.requireMeta(root) == ((6, 64, "float")))
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root))) === want)
    // a root-level marker next to a tree that carries its OWN meta is
    // residue the current tree disowns — deleted, never adopted
    java.nio.file.Files.write(legacy.toPath,
      "bits=9\nmaxBucket=9\ncoder=float\n".getBytes("UTF-8"))
    VectorIndex.recover(root)
    assert(!legacy.exists())
    assert(VectorIndex.requireMeta(root) == ((6, 64, "float")))
  }

  test("table-local compaction: only overweight dirs rewrite, each re-caps " +
      "to its table's full-rebuild survivor set, untouched dirs keep their " +
      "files, and a crashed table swap refuses serving then heals") {
    val (maxBucket, bits) = (4, 6) // truncating cap — re-cap must bind
    val all = embAll()
    val a = all.filter(col("vec_id") % 3 =!= 0)
    val b = all.filter(col("vec_id") % 3 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-vidxtl").toString
    VectorIndex.buildInto(root, a, maxBucket, bits)
    // a PER-TABLE-grain slice append: only t=0 gains a second segment
    // (a normal appendTo touches every table — this is the asymmetric
    // regime table-local compaction exists for)
    VectorOps.capBuckets(VectorOps.lshEntries(withNrm(b), bits), maxBucket)
      .filter(col("t") === 0)
      .repartition(1).sortWithinPartitions("t", "bucket", "nid")
      .write.mode("append").partitionBy("t")
      .option("compression", "zstd")
      .parquet(VectorIndex.indexDir(root))
    val idxRoot = new java.io.File(VectorIndex.indexDir(root))
    def filesOf(d: java.io.File): Set[String] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    def tableDirs() = idxRoot.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("t="))
    assert(tableDirs().count(d => filesOf(d).size > 1) == 1)
    val untouched = tableDirs().filter(d => filesOf(d).size == 1)
      .map(d => d.getName -> filesOf(d)).toMap
    assert(untouched.nonEmpty)
    // the expected survivor set for the rewritten table: the cap rule
    // over the merged (deduped) entry set of t=0 — per-table re-cap IS
    // the global rule restricted to the table
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    val mergedT0 = spark.read.parquet(VectorIndex.indexDir(root))
      .select("nid", "ne", "nn", "t", "bucket")
      .filter(col("t") === 0)
      .dropDuplicates("t", "bucket", "nid").localCheckpoint()
    val wantT0 = keys(VectorOps.capBuckets(mergedT0, maxBucket))
    val wantOthers = keys(spark.read.parquet(VectorIndex.indexDir(root))
      .filter(col("t") =!= 0))
    VectorIndex.compactTables(root, spark)
    assert(VectorIndex.segments(root) == 1)
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    val after = spark.read.parquet(VectorIndex.indexDir(root))
    assert(keys(after.filter(col("t") === 0)) === wantT0)
    assert(keys(after.filter(col("t") =!= 0)) === wantOthers)
    untouched.foreach { case (name, files) =>
      assert(filesOf(new java.io.File(idxRoot, name)) == files,
        s"$name was rewritten though it was not overweight")
    }
    // a NORMAL append (touches every table) + table-local compaction
    // converges on the full rebuild over everything folded in — the
    // global-compact convergence claim, now for the per-batch entry
    VectorIndex.appendTo(root, b)
    VectorIndex.compactTables(root, spark)
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root)))
      === keys(VectorOps.lshIndex(withNrm(all), maxBucket, bits)))
    // crash point: a table dir renamed aside with its swap-in never run —
    // serving must refuse loudly (t would widen to string and the
    // aside's rows would silently match nothing in the (t, bucket) join)
    val victim = tableDirs().head
    val aside = new java.io.File(idxRoot, victim.getName + ".old-crashed")
    assert(victim.renameTo(aside))
    val e = intercept[IllegalArgumentException] {
      VectorIndex.load(spark, root)
    }
    assert(e.getMessage.contains("residue"), e.getMessage)
    VectorIndex.recover(root)
    assert(victim.exists() && !aside.exists())
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root)))
      === keys(VectorOps.lshIndex(withNrm(all), maxBucket, bits)))
  }

  test("a degenerate (empty) embeddings dataset still ensures a servable " +
      "empty artifact") {
    // the r12 ADVICE guard: ensure's maintenance-proof requires are
    // about work that existed — an empty table must still build a valid
    // empty artifact, and the serving load must return the empty set
    // instead of failing schema inference over zero files
    import spark.implicits._
    val ds = java.nio.file.Files.createTempDirectory("graft-vidxe").toString
    Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
      .write.parquet(s"$ds/embeddings.parquet")
    val root = VectorIndex.ensureExactSig(spark, ds)
    assert(new java.io.File(s"${VectorIndex.indexDir(root)}/_SUCCESS").exists())
    assert(VectorIndex.segments(root) == 0)
    val (served, bits, coder) = VectorIndex.load(spark, root)
    assert(served.count() == 0)
    assert(bits == 8 && coder == VectorIndex.coderExactSig)
  }

  test("a crash between compaction's aside and swap-in renames heals on recover") {
    val root = java.nio.file.Files.createTempDirectory("graft-vidxh").toString
    VectorIndex.buildInto(root, embAll().filter(col("vec_id") % 5 === 1), 64, 6)
    val want = keys(spark.read.parquet(VectorIndex.indexDir(root)))
    val live = new java.io.File(VectorIndex.indexDir(root))
    val aside = new java.io.File(VectorIndex.indexDir(root) + ".old-crashed")
    assert(live.renameTo(aside))
    VectorIndex.recover(root)
    assert(live.exists() && !aside.exists())
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    assert(keys(spark.read.parquet(VectorIndex.indexDir(root))) === want)
  }
}
