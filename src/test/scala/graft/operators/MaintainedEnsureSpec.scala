package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The prepare-path artifacts are built the way production MAINTAINS
  * them (r11): a deterministic prefix build, an appendTo of the
  * remainder, a compact — with in-builder segment requires that fail
  * prepare loudly if any step is skipped. This spec drives the real
  * `ensure` entry points end-to-end on a private copy of the dataset
  * (so the session's shared fingerprint-keyed artifacts are never
  * clobbered under other suites) and pins that the MAINTAINED artifact
  * equals the one-shot full rebuild bit-for-bit — the claim the
  * q_ann_sig_indexed / q_winnow_match_indexed driver rows then
  * hash-check against raw-recompute DuckDB oracles every round.
  */
class MaintainedEnsureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  graft.functions.VectorFunctions.ensureRegistered(spark)

  /** Private dataset copy: same bytes, different fingerprint root. */
  private val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ensure-ds").toString
    for (t <- Seq("documents", "embeddings")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        java.nio.file.Paths.get(s"$d/$t.parquet")): Unit
    }
    d
  }

  test("ensureExactSig: the prefix+append+compact maintained artifact equals " +
      "the one-shot full rebuild, and serves with exactsig meta") {
    val root = VectorIndex.ensureExactSig(spark, dir)
    // ran the full chain: compact left exactly one segment per table dir
    assert(VectorIndex.segments(root) == 1)
    assert(VectorIndex.requireMeta(root) == ((8, 100000, "exactsig4")))
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(
        col("embedding"), col("embedding"))))
    val want = VectorOps.capBuckets(VectorOps.exactSigEntries(emb, 4, 8), 100000)
      .select(col("t").cast("int"), col("bucket").cast("long"), col("nid"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val got = spark.read.parquet(VectorIndex.indexDir(root))
      .select(col("t").cast("int"), col("bucket").cast("long"), col("nid"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // idempotent: a second ensure serves the committed artifact untouched
    assert(VectorIndex.ensureExactSig(spark, dir) == root)
  }

  test("WinnowIndex.ensure: the prefix+append+compact maintained fingerprint " +
      "set equals the full corpus slice's, under a valid manifest") {
    val root = WinnowIndex.ensure(spark, dir)
    assert(WinnowIndex.segments(root) == 1)
    val corpus = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 =!= 0)
    val want = TextOps.winnowOver(corpus, 3, 4).select("fp").distinct()
      .collect().map(_.getLong(0)).toSet
    val got = spark.read.parquet(WinnowIndex.fpsDir(root))
      .select("fp").distinct().collect().map(_.getLong(0)).toSet
    assert(got === want)
    // the re-cut manifest stays a valid complete non-decreasing scheme
    val bounds = WinnowIndex.boundsOf(root, TextOps.WinnowMd5)
    assert(bounds.length == 63 &&
      bounds.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // both prefix and appended-remainder docs contributed fingerprints
    // (the append was real work, not a vacuous empty slice)
    val prefixFps = TextOps.winnowOver(corpus.filter(col("doc_id") % 5 =!= 1), 3, 4)
      .select("fp").distinct().collect().map(_.getLong(0)).toSet
    assert((want -- prefixFps).nonEmpty,
      "remainder slice added no new fingerprints; maintenance proof vacuous")
  }
}
