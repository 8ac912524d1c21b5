package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
// (r14) the trained-maintainer stream test drives TrainedAnn's
// slice-probe/refit lifecycle through the foreachBatch hook
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Streaming embedding near-dup vs corpus: the kernel is stateless, so a
  * fully-drained stream must emit exactly the batch run of the same code;
  * precision is exact (cosine-confirmed) and recall across 16 LSH tables
  * is pinned against the exact brute-force pair set.
  */
class VectorStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private val bits = 8

  /** The corpus embeddings carry no high-cosine pairs across an id split,
    * so the "new batch" is built the way the real workload produces one: a
    * re-crawl REEMBEDS near-identical content, landing within a degree or
    * two of the original vector. Deterministic small rotation, cosine with
    * the parent ≈ 0.998.
    */
  private def recrawl(): Seq[(Long, Seq[Float])] =
    graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
      .map { case (id, e) =>
        val v = e.toIndexedSeq
        (10000L + id, v.indices.map(i => v(i) + 0.05f * v((i + 1) % v.length)))
      }.sortBy(_._1)

  test("drained stream-vs-corpus hits equal the batch run of the same kernel") {
    val emb = graft.Tables.embeddings(spark, dir)
    val corpusIdx = VectorStream.corpusIndexOf(emb, bits).persist()
    val streamRows = recrawl()
    assert(streamRows.nonEmpty)

    val expected = VectorStream.candidatesVsCorpus(
        streamRows.toDF("vec_id", "embedding"), corpusIdx, bits)
      .select("vec_id", "corpus_vec").distinct()
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "no stream-vs-corpus near-dups; test is vacuous")

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS.select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = VectorStream.candidatesVsCorpus(stream, corpusIdx, bits)
      .writeStream.format("memory").queryName("vec_hits")
      .outputMode("append").start()
    try {
      val (first, second) = streamRows.splitAt(streamRows.length / 2)
      mem.addData(first.toSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("vec_hits")
      .select("vec_id", "corpus_vec").distinct()
      .as[(Long, Long)].collect().toSet
    corpusIdx.unpersist()
    assert(got == expected)
  }

  test("precision is exact and 16-table recall >= 0.9 vs brute-force cosine pairs") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val emb = graft.Tables.embeddings(spark, dir)
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(
        col("embedding"), col("embedding"))))
    val streamDf = recrawl().toDF("vec_id", "embedding")
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(
        col("embedding"), col("embedding"))))
    // exact new×corpus pairs at the stream threshold, same arithmetic
    val exact = streamDf
      .select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
      .crossJoin(emb
        .select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb")))
      .withColumn("cosine", graft.functions.VectorFunctions.dot(col("ea"), col("eb")) /
        (col("na") * col("nb")))
      .filter(col("cosine") >= 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "no 0.95-cosine stream-vs-corpus pairs; test is vacuous")

    val corpusIdx = VectorStream.corpusIndexOf(emb, bits)
    val got = VectorStream.candidatesVsCorpus(
        streamDf.select("vec_id", "embedding"), corpusIdx, bits)
      .select("vec_id", "corpus_vec").distinct()
      .as[(Long, Long)].collect().toSet

    val spurious = got -- exact
    assert(spurious.isEmpty, s"cosine-confirmed pairs must be exact: $spurious")
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below floor (|exact|=${exact.size})")
  }

  test("refreshing corpus index: additions invisible until the refresh boundary, then hit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vecidx").toString
    // two orthogonal-ish deterministic 64-dim vectors
    val vecA: Seq[Float] = (0 until 64).map(i => if (i < 32) 1.0f else 0.1f)
    val vecB: Seq[Float] = (0 until 64).map(i => if (i < 32) 0.1f else -1.0f)
    VectorStream.corpusIndexOf(
        Seq((1L, vecA)).toDF("vec_id", "embedding"), bits)
      .write.mode("overwrite").parquet(tmp)

    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS.select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = VectorStream.candidatesVsCorpusRefreshing(
        stream, tmp, refreshEvery = 2, bits = bits) { (df, bid) =>
      val rows = df.select("vec_id", "corpus_vec").distinct().collect()
      hits.synchronized {
        rows.foreach(r => hits += ((bid, r.getLong(0), r.getLong(1))))
      }
    }.start()
    try {
      // batch 0 (refresh): an exact re-embed of corpus vector 1 hits it
      mem.addData((9001L, vecA))
      q.processAllAvailable()
      // corpus addition delivered as a raw part-file move (a same-session
      // write would auto-recache via refreshByPath and defeat staleness)
      val side = java.nio.file.Files.createTempDirectory("graft-vecidx-add").toString
      VectorStream.corpusIndexOf(
          Seq((2L, vecB)).toDF("vec_id", "embedding"), bits)
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(tmp, part.getName))
      // batch 1 (no refresh): stale snapshot — 9002 misses vector 2
      mem.addData((9002L, vecB))
      q.processAllAvailable()
      // batch 2 (refresh): the same embedding now hits the addition
      mem.addData((9003L, vecB))
      q.processAllAvailable()
    } finally q.stop()

    assert(hits.toSet == Set((0L, 9001L, 1L), (2L, 9003L, 2L)), s"got $hits")
  }

  test("maintained-artifact serving: refresh path reads the VectorIndex root, " +
      "appends become visible at the next refresh") {
    import graft.operators.VectorIndex
    val root = java.nio.file.Files.createTempDirectory("graft-vecart").toString
    val vecA: Seq[Float] = (0 until 64).map(i => if (i < 32) 1.0f else 0.1f)
    val vecB: Seq[Float] = (0 until 64).map(i => if (i < 32) 0.1f else -1.0f)
    VectorIndex.buildInto(root,
      Seq((1L, vecA)).toDF("vec_id", "embedding"), maxBucket = 64, bits = bits)

    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS.select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = VectorStream.candidatesVsIndexRefreshing(
        stream, root, refreshEvery = 1) { (df, bid) =>
      val rows = df.select("vec_id", "corpus_vec").distinct().collect()
      hits.synchronized {
        rows.foreach(r => hits += ((bid, r.getLong(0), r.getLong(1))))
      }
    }.start()
    try {
      // batch 0: an exact re-embed of corpus vector 1 hits the artifact
      mem.addData((9001L, vecA))
      q.processAllAvailable()
      // the maintainer folds a new slice in and compacts (a crash-swap
      // publish mid-stream) — visible at the next refresh boundary
      VectorIndex.appendTo(root, Seq((2L, vecB)).toDF("vec_id", "embedding"))
      VectorIndex.compact(root, spark)
      mem.addData((9002L, vecB))
      q.processAllAvailable()
    } finally q.stop()
    assert(hits.toSet == Set((0L, 9001L, 1L), (1L, 9002L, 2L)), s"got $hits")
  }

  test("maintained-artifact serving refuses a cross-coder root loudly — " +
      "float stream codes never silently join exactsig buckets") {
    import graft.operators.VectorIndex
    val root = java.nio.file.Files.createTempDirectory("graft-veccoder").toString
    val vecA: Seq[Float] = (0 until 64).map(i => if (i < 32) 1.0f else 0.1f)
    VectorIndex.buildInto(root,
      Seq((1L, vecA)).toDF("vec_id", "embedding"), maxBucket = 64,
      bits = bits, coder = VectorIndex.coderExactSig)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS.select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = VectorStream.candidatesVsIndexRefreshing(
        stream, root, refreshEvery = 1) { (df, _) => df.collect(): Unit }
      .start()
    try {
      mem.addData((9001L, vecA))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      // the refusal is the refresh loader's actionable coder mismatch,
      // not a silent zero-candidate drain
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("coded 'exactsig4'")),
        messages(e).mkString(" | "))
    } finally q.stop()
  }

  test("appendStream maintains the artifact: drained ingest + compact equals " +
      "a full rebuild; segment count stays bounded") {
    import graft.operators.{VectorIndex, VectorOps}
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val (maxBucket, bitsN) = (4, 6)
    val all = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val rows = all.as[(Long, Seq[Float])].collect().sortBy(_._1)
    val (base, incoming) = rows.splitAt(rows.length / 3)
    val root = java.nio.file.Files.createTempDirectory("graft-vecas").toString
    VectorIndex.buildInto(root, base.toSeq.toDF("vec_id", "embedding"),
      maxBucket, bitsN)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS.select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = VectorStream.appendStream(stream, root, maxSegments = 2).start()
    try {
      incoming.grouped(math.max(incoming.length / 4, 1)).foreach { slice =>
        mem.addData(slice.toSeq: _*)
        q.processAllAvailable()
        // the maintainer's bound: auto-compaction keeps per-table file
        // count from growing with appends
        assert(VectorIndex.segments(root) <= 3,
          s"segment bound violated: ${VectorIndex.segments(root)}")
      }
    } finally q.stop()
    VectorIndex.compact(root, spark)
    spark.catalog.refreshByPath(VectorIndex.indexDir(root))
    val got = spark.read.parquet(VectorIndex.indexDir(root))
      .select(col("t").cast("int"), col("bucket").cast("int"), col("nid"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val want = VectorOps.lshIndex(
        all.withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(
          col("embedding"), col("embedding")))), maxBucket, bitsN)
      .select(col("t").cast("int"), col("bucket").cast("int"), col("nid"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("trained-model maintainer stream: an in-distribution batch probes " +
      "only; a planted mid-stream shift fires the refit ON ITS OWN batch, " +
      "bumps the model generation, and the refit re-pins as the " +
      "deterministic full fit over everything folded") {
    import graft.operators.{TrainedAnn, VectorOps}
    val rows = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val (baseRows, incoming) = rows.splitAt(rows.length / 2)
    val root = java.nio.file.Files
      .createTempDirectory("graft-tann-stream").toString
    TrainedAnn.buildIvfInto(root,
      baseRows.toSeq.toDF("vec_id", "embedding"), k = 4, iters = 3,
      "tann-stream-fit0")
    val gen0 = TrainedAnn.loadModel(root).get.gen
    var folded = Seq.empty[(Long, Seq[Float])]
    def full() = (baseRows ++ folded).toSeq.toDF("vec_id", "embedding")
    val maintained = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Double, Boolean)]
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = VectorStream.trainedIvfMaintainerStream(stream, root,
      () => full(), 4, 3, "tann-stream",
      (bid, r, f) => maintained += ((bid, r, f))).start()
    try {
      // batch 1: in-distribution traffic (the corpus's other half)
      val (b1, b2src) = incoming.splitAt(incoming.length / 2)
      folded = folded ++ b1
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      // batch 2: the planted shift — re-embedded at 3x scale
      val b2 = b2src.map { case (id, e) => (100000L + id, e.map(_ * 3.0f)) }
      folded = folded ++ b2
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(maintained.size == 2, maintained.toString)
    assert(!maintained(0)._3 && maintained(0)._2 <= TrainedAnn.refitBound,
      s"in-distribution batch misread as drift: ${maintained(0)}")
    assert(maintained(1)._3 && maintained(1)._2 > TrainedAnn.refitBound,
      s"planted shift not caught on its own batch: ${maintained(1)}")
    val m = TrainedAnn.loadModel(root).get
    assert(m.gen == gen0 + 1)
    // the refit IS the deterministic full fit over everything folded —
    // self-ratio 1 by construction, codebook bit-for-bit
    assert(TrainedAnn.ivfDriftRatio(root, full()) === 1.0)
    assert(m.ivfCents ===
      VectorOps.kmeansFitOver(full(), 4, 3, "tann-stream-repin")._1)
  }

  test("annServingAppendStream maintains the IVF serving table: drained " +
      "ingest (with mid-stream list-local compaction) converges to the " +
      "direct full assignment; a mid-stream codebook regen refuses loudly") {
    import graft.operators.{AnnServing, VectorOps}
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val emb = graft.Tables.embeddings(spark, dir)
    val model = VectorOps.ivfModelFp(spark, dir)
    val root = java.nio.file.Files
      .createTempDirectory("graft-annserv-stream").toString
    AnnServing.buildInto(root,
      VectorOps.ivfAssignedRows(spark, dir,
        emb.filter(col("vec_id") % 3 =!= 0)),
      AnnServing.Ivf, model)
    val incoming = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").cast("long"), col("embedding"),
        col("label").cast("int"))
      .as[(Long, Seq[Float], Int)].collect().sortBy(_._1)
    assert(incoming.nonEmpty)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val stream = mem.toDS.select(col("_1").as("vec_id"),
      col("_2").as("embedding"), col("_3").as("label"))
    // maxSegments=1 so the SECOND batch pushes a touched list dir past
    // the bound and the list-local compaction runs mid-stream
    val q = VectorStream.annServingAppendStream(stream, root,
      AnnServing.Ivf, dir, maxSegments = 1).start()
    try {
      incoming.grouped(math.max(incoming.length / 3, 1)).foreach { slice =>
        mem.addData(slice.toSeq: _*)
        q.processAllAvailable()
        assert(AnnServing.segments(root) <= 2,
          s"segment bound violated: ${AnnServing.segments(root)}")
      }
    } finally q.stop()
    spark.catalog.refreshByPath(AnnServing.assignDir(root))
    val got = AnnServing.load(spark, root, AnnServing.Ivf, model)
      .select("nid", "cid", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val want = VectorOps.ivfAssignedRows(spark, dir, emb)
      .select("nid", "cid", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got.nonEmpty && got === want)

    // the write-side cascade: a codebook regenerated mid-stream (the
    // artifact now records a different model than the maintainer
    // pinned at start) makes the NEXT append refuse loudly
    java.nio.file.Files.write(
      new java.io.File(s"${AnnServing.assignDir(root)}/_meta").toPath,
      s"family=${AnnServing.Ivf.name}\nmodel=refit-1111\n".getBytes())
    val q2 = VectorStream.annServingAppendStream(stream, root,
      AnnServing.Ivf, dir, maxSegments = 1).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        mem.addData(incoming.take(5).toSeq: _*)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("cascade")), e.toString)
  }
}
