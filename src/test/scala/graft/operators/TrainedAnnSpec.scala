package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The trained-ANN maintenance lifecycle (r13): appends serve by
  * assign-to-nearest under the stale codebook with a pinned recall
  * floor, the drift probe separates in-distribution growth from genuine
  * shift, the refit rule fires exactly past the bound, and the ensure
  * chain converges on the deterministic full fit — the claim that keeps
  * q_kmeans / q_ann_ivf_exactsig / q_ann_pq_exactsig hash-green while
  * serving from the maintained artifacts.
  */
class TrainedAnnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  graft.functions.VectorFunctions.ensureRegistered(spark)

  /** Private dataset copy — the shared fingerprint-keyed artifacts are
    * never clobbered under other suites.
    */
  private val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-tann-ds").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      java.nio.file.Paths.get(s"$d/embeddings.parquet")): Unit
    d
  }

  private def emb = graft.Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding"))

  test("ensureIvf converges on the deterministic full fit bit-for-bit " +
      "(the oracle-exactness claim), and is idempotent") {
    val root = TrainedAnn.ensureIvf(spark, dir, k = 4, iters = 3)
    val m = TrainedAnn.requireModel(root, "ivf_exactsig")
    val (want, _) = VectorOps.kmeansFitOver(emb, 4, 3, "tann-spec-full")
    assert(m.ivfCents === want)
    // fit stats recorded and sane (the drift probe's denominator)
    assert(m.nFit > 0 && m.inertiaFit > 0)
    // self-ratio of the published model over its own fit corpus is 1
    assert(TrainedAnn.ivfDriftRatio(root, emb) === 1.0)
    assert(TrainedAnn.ensureIvf(spark, dir, 4, 3) == root)
  }

  test("ensurePq converges on the deterministic full PQ fit") {
    val root = TrainedAnn.ensurePq(spark, dir, subs = 8, codes = 8, iters = 2)
    val m = TrainedAnn.requireModel(root, "pq_exactsig")
    val want = VectorOps.pqFitQ(VectorOps.quantizedFor(spark, dir),
      8, 8, 8, 2, "tann-spec-pqfull")
    assert(m.pqCents === want)
    assert(TrainedAnn.pqDriftRatio(root,
      VectorOps.quantizedFor(spark, dir)) === 1.0)
  }

  test("recall under a STALE prefix codebook with appended vectors " +
      "assigned to nearest existing centroid stays above the floor") {
    val root = java.nio.file.Files.createTempDirectory("graft-tann-stale").toString
    val prefix = emb.filter(col("vec_id") % 3 =!= 0)
    TrainedAnn.buildIvfInto(root, prefix, k = 8, iters = 5, "tann-spec-prefix")
    val stale = TrainedAnn.requireModel(root, "ivf_exactsig").ivfCents
    // the append path: EVERY corpus vector (old + appended) assigned to
    // its nearest EXISTING centroid — one map-only pass, no refit
    def assignedUnder(cents: IndexedSeq[Seq[Long]]) =
      VectorOps.assignQForTest(VectorOps.quantized(emb), cents)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          col("dist_q"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("qid"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("nid")).toSet }
    // ground truth: probing ALL lists scores the whole corpus — exact
    // top-k regardless of codebook quality
    val truth = topSets(VectorOps.annIvfExactSigWith(spark, dir, stale,
      assignedUnder(stale), nProbe = 8, topK = 10))
    assert(truth.nonEmpty)
    def recallOf(cents: IndexedSeq[Seq[Long]]): Double = {
      val got = topSets(VectorOps.annIvfExactSigWith(spark, dir, cents,
        assignedUnder(cents), nProbe = 2, topK = 10))
      val rs = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      rs.sum / rs.size
    }
    val staleRecall = recallOf(stale)
    // the comparison that isolates the APPEND penalty from the tiny-
    // corpus regime: the FRESH full fit's recall at the same nProbe
    val (fresh, _) = VectorOps.kmeansFitOver(emb, 8, 5, "tann-spec-fresh")
    val freshRecall = recallOf(fresh)
    info(f"nProbe=2 recall: stale-codebook $staleRecall%.2f vs " +
      f"fresh-fit $freshRecall%.2f")
    // serving between refits must not collapse: the stale codebook keeps
    // (most of) the fresh fit's recall, and an absolute floor holds
    assert(staleRecall >= freshRecall - 0.15,
      f"append penalty too large: stale $staleRecall%.2f vs fresh $freshRecall%.2f")
    assert(staleRecall >= 0.4, f"stale-codebook recall fell to $staleRecall%.2f")
  }

  test("a PQ fit over an EMPTY corpus publishes a degenerate model that " +
      "REFUSES to serve with an actionable message — not a raw " +
      "NoSuchElementException at prepare time") {
    val root = java.nio.file.Files.createTempDirectory("graft-tann-empty").toString
    val empty = VectorOps.quantizedFor(spark, dir).filter(col("vec_id") < 0)
    // prepare-time path: fit + inertia over zero rows must complete
    TrainedAnn.buildPqInto(root, empty, subs = 8, codes = 8, iters = 2,
      "tann-empty-pq")
    val m = TrainedAnn.requireModel(root, "pq_exactsig")
    assert(m.rows.isEmpty && m.nFit == 0L && m.inertiaFit == 0L)
    // serving REFUSES with the actionable empty-codebook message
    val e = intercept[IllegalArgumentException] { m.pqCents }
    assert(e.getMessage.contains("EMPTY"), e.getMessage)
    // ... and so does the drift probe over a grown corpus (the gate runs
    // BEFORE any inertia arithmetic could read a phantom codeword)
    val e2 = intercept[IllegalArgumentException] {
      TrainedAnn.pqDriftRatio(root, VectorOps.quantizedFor(spark, dir))
    }
    assert(e2.getMessage.contains("EMPTY"), e2.getMessage)
  }

  test("the drift rule: in-distribution growth does NOT refit; a " +
      "distribution shift measures past the bound, refits, and the new " +
      "fit's self-ratio returns to 1") {
    val root = java.nio.file.Files.createTempDirectory("graft-tann-drift").toString
    val prefix = emb.filter(col("vec_id") % 3 =!= 0)
    TrainedAnn.buildIvfInto(root, prefix, k = 4, iters = 3, "tann-drift-fit")
    val before = TrainedAnn.requireModel(root, "ivf_exactsig").ivfCents
    // in-distribution: the full corpus (appends drawn from the same
    // distribution as the prefix) — ratio near 1, no refit
    val (r1, refit1) = TrainedAnn.maintainIvf(root, emb, 4, 3, "tann-drift-m1")
    info(f"in-distribution drift ratio $r1%.4f")
    assert(!refit1 && r1 <= TrainedAnn.refitBound,
      s"in-distribution growth triggered a refit (ratio $r1)")
    assert(TrainedAnn.requireModel(root, "ivf_exactsig").ivfCents === before)
    // genuine shift: the corpus re-embedded at 3x scale — quantization
    // error under the stale centroids blows up
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(3.0f)).as("embedding"))
    val (r2, refit2) = TrainedAnn.maintainIvf(root, shifted, 4, 3, "tann-drift-m2")
    info(f"shifted-corpus drift ratio $r2%.4f")
    assert(refit2 && r2 > TrainedAnn.refitBound,
      s"shift not caught: ratio $r2, refit=$refit2")
    // the refit model describes the shifted corpus exactly
    assert(TrainedAnn.ivfDriftRatio(root, shifted) === 1.0)
    assert(TrainedAnn.requireModel(root, "ivf_exactsig").ivfCents !== before)
  }
}
