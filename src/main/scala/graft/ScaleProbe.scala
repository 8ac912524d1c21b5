package graft

import org.apache.spark.sql.SparkSession

/** Measured scale probe for SCALE.md: synthesize a documents corpus with
  * the same generative recipe at 1× (5k docs, the sf0.1 size) and 10×
  * (50k), run the priciest query families on both, and print observed
  * t(10×)/t(1×) ratios next to the per-operator complexity claims.
  *
  * The corpus is fully deterministic and ORDER-INDEPENDENT: every doc
  * derives from a per-doc-id seed, so the 1× corpus is literally the
  * first 5k docs of the 10× corpus and generation parallelizes with no
  * coordination. ~14% of docs are near-duplicates of an earlier doc
  * (5% token mutation), so dedup pair density scales the way a real
  * crawl's does.
  */
object ScaleProbe {

  private val langs = Vector("en", "de", "fr", "es", "it")
  private val vocabSize = 2000

  final case class SynthDoc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  private def rngFor(i: Long) =
    new java.util.Random(0x5CA1EB0BL ^ (i * 0x9E3779B97F4A7C15L))

  private def isDup(i: Long): Boolean = i > 20 && i % 7 == 3

  /** Walk dup-of-dup chains down to a fresh base doc (expected ~ln n). */
  private def resolveBase(i: Long): Long = {
    var cur = i
    while (isDup(cur)) cur = rngFor(cur).nextInt(cur.toInt).toLong
    cur
  }

  private def freshTokens(i: Long): IndexedSeq[String] = {
    val rnd = rngFor(i)
    val lang = langs((i % langs.size).toInt)
    val len = 30 + rnd.nextInt(170)
    // squared draw skews toward low word ids — a zipf-ish head
    IndexedSeq.fill(len) {
      val w = (rnd.nextDouble() * rnd.nextDouble() * vocabSize).toInt
      s"${lang}w$w"
    }
  }

  def synthDoc(i: Long): SynthDoc = {
    val lang = langs((i % langs.size).toInt)
    val tokens =
      if (isDup(i)) {
        val rnd = rngFor(i)
        val base = freshTokens(resolveBase(rnd.nextInt(i.toInt).toLong))
        base.map(t => if (rnd.nextDouble() < 0.05) s"${lang}m${rnd.nextInt(vocabSize)}" else t)
      } else freshTokens(i)
    val text = tokens.mkString(" ")
    // ten sources so the source-conditioned families (dsirSelect's
    // target slice) see the driver corpus' shape; text is a pure
    // function of the id either way, so no other family's input moves.
    // (Delete $SPARK_GRAFT_PROBE_DIR after changing the recipe — tiers
    // are cached behind _SUCCESS markers.)
    SynthDoc(i, text, lang, s"src${i % 10}", text.length.toLong)
  }

  /** One synthesis guard/write for every document-corpus variant: skip
    * behind the `_SUCCESS` marker (tiers are cached across runs — delete
    * the probe dir after changing a recipe), else write the id-pure rows.
    */
  private def synthDocsWith(spark: SparkSession, dir: String, n: Long)(
      gen: Long => SynthDoc): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet/_SUCCESS")
    if (fs.exists(done)) return
    import spark.implicits._
    spark.range(0, n).map(i => gen(i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def synthesize(spark: SparkSession, dir: String, n: Long): Unit =
    synthDocsWith(spark, dir, n)(synthDoc)

  private val probeQueries = Seq("q_ngram_jaccard", "q_corpus_build",
    "q_dedup_clusters", "q_minhash_lsh", "q_simhash",
    "q_decontaminate", "q_repetition", "q_chunk_dedup",
    "q_pack_sequences", "q_vocab_df", "q_incremental_dedup",
    "q_pii_scrub", "q_lm_score", "q_tfidf_terms", "q_corpus_stats",
    "q_bpe_merges", "q_dup_spans", "q_span_scrub",
    "q_dsir_select", "q_filter_funnel",
    "q_perplexity_bucket", "q_oov_rate", "q_top_ngrams", "q_containment",
    "q_rag_chunks", "q_quality_survivor", "q_winnow", "q_winnow_overlap")

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  // ---- hot-key (skew) tier ---------------------------------------------

  /** One 16-token boilerplate chunk PREPENDED to ~30% of documents — the
    * nav-template shape of a real crawl, and the exact artifact the r6
    * verdict flagged: a content-hash key whose occurrence count grows
    * linearly with the corpus. Prepending keeps the chunk at aligned
    * position 1, so [[graft.operators.TextOps.chunkDedup]]'s fixed
    * 16-token chunking sees ONE hot `ck`, and the w=8 span family sees 9
    * hot `gk`s, each in 30% of all documents.
    */
  private val hotChunk = (0 until 16).map(j => s"navt$j").mkString(" ")

  private def synthDocSkew(i: Long): SynthDoc = {
    val d = synthDoc(i)
    if (i % 10 < 3) d.copy(text = hotChunk + " " + d.text,
      n_chars = (hotChunk.length + 1 + d.text.length).toLong)
    else d
  }

  private def synthesizeSkew(spark: SparkSession, dir: String, n: Long): Unit =
    synthDocsWith(spark, dir, n)(synthDocSkew)

  /** Viral exact duplicate: ~30% of the NEW batch (doc_id % 10 == 9, the
    * slice [[graft.operators.TextOps.incrementalDedup]] treats as today's
    * crawl) carries the exact text of one batch document (doc 9 — a fresh
    * doc whose fingerprint is absent from the existing corpus, so every
    * copy survives the anti-join and lands in the within-batch first-wins
    * resolution). The press-release/chain-letter shape: ONE content
    * fingerprint owns 30% of the batch. The de-skewed `min(doc_id) per
    * fp` collapses it map-side; the r7 row_number window over fp would
    * have pinned every copy on a single task.
    */
  private def synthDocDupSkew(i: Long): SynthDoc = {
    val d = synthDoc(i)
    if (i % 10 == 9 && i > 9 && (i / 10) % 10 < 3) {
      val base = synthDoc(9L)
      d.copy(text = base.text, lang = base.lang, n_chars = base.n_chars)
    } else d
  }

  private def synthesizeDupSkew(spark: SparkSession, dir: String, n: Long): Unit =
    synthDocsWith(spark, dir, n)(synthDocDupSkew)

  /** The r6 plan — min/count over `Window.partitionBy(content key)` —
    * re-expressed inline as a measured STRAWMAN: every occurrence of the
    * hot chunk lands in one task (windows cannot map-side-combine and
    * AQE does not split them). The production operators no longer ship
    * this shape; the probe keeps it to put a number on what the de-skew
    * rewrite avoids.
    */
  private def naiveChunkWindow(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t = split(col("text"), " ")
    val chunkArr = transform(sequence(lit(1), size(t), lit(16)),
      s => array_join(slice(t, s, lit(16)), " "))
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(array_distinct(chunkArr)).as("chunk"))
      .select(col("doc_id"), unhex(md5(col("chunk").cast("binary"))).as("ck"))
      .withColumn("first_doc", min(col("doc_id")).over(Window.partitionBy("ck")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("first_doc") < col("doc_id"), lit(1))).as("n_dup_chunks"))
  }

  /** The span family's windowed strawman, measured through the flag stage
    * (where the hot-key cost lives): count + row_number over the gram-key
    * window, then a per-document rollup of flagged positions.
    */
  private def naiveSpanWindow(spark: SparkSession, dir: String, w: Int = 8): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t = split(col("text"), " ")
    val gk = Window.partitionBy("gk")
    docs.filter(col("text").isNotNull && size(t) >= w)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(t) - (w - 1)),
          s => array_join(slice(t, s, lit(w)), " "))))
      .select(col("doc_id"), (col("pos") + 1).as("i"),
        unhex(md5(col("col").cast("binary"))).as("gk"))
      .withColumn("n", count(lit(1)).over(gk))
      .withColumn("rn", row_number().over(gk.orderBy("doc_id", "i")))
      .filter(col("n") >= 2 && col("rn") > 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_flagged"))
  }

  /** Skew tier: the de-skewed chunk/span family on the hot-key corpus vs
    * the same-size unskewed corpus (ratio ≈ the extra duplicated-text
    * volume, NOT a task pin), and the windowed strawmen on the same
    * skewed corpus for the before/after contrast SCALE.md records.
    */
  private def skewProbe(spark: SparkSession, base: String,
      plain10: String): Seq[String] = {
    val dSkew = s"$base/skew10"
    synthesizeSkew(spark, dSkew, 50000L)
    def time3(f: => Unit): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })
    val fams = Seq("q_chunk_dedup", "q_dup_spans", "q_span_scrub",
      // containment should be structurally immune: df-ASCENDING prefix
      // order keeps the hot boilerplate shingles out of every prefix
      "q_containment")
    val deskewed = fams.map { qn =>
      val fn = SparkEntry.queries(qn)
      Bench.force(fn(spark, dSkew)); Bench.force(fn(spark, plain10)) // warmup
      val tSkew = time3(Bench.force(fn(spark, dSkew)))
      val tPlain = time3(Bench.force(fn(spark, plain10)))
      println(f"[scaleprobe] skew/$qn%-16s skew10=$tSkew%6.2fs plain10=$tPlain%6.2fs " +
        f"ratio=${tSkew / tPlain}%5.2f")
      s""""skew_$qn":{"skew10":$tSkew,"plain10":$tPlain,"ratio":${tSkew / tPlain}}"""
    }
    // hot-exact-duplicate tier: incrementalDedup on a batch where one
    // fingerprint owns 30% of the new docs vs the plain same-size corpus
    val dDup = s"$base/dupskew10"
    synthesizeDupSkew(spark, dDup, 50000L)
    val dupRow = {
      val fn = SparkEntry.queries("q_incremental_dedup")
      Bench.force(fn(spark, dDup)); Bench.force(fn(spark, plain10)) // warmup
      val tSkew = time3(Bench.force(fn(spark, dDup)))
      val tPlain = time3(Bench.force(fn(spark, plain10)))
      println(f"[scaleprobe] skew/q_incremental_dedup(dup) dupskew10=$tSkew%6.2fs " +
        f"plain10=$tPlain%6.2fs ratio=${tSkew / tPlain}%5.2f")
      s""""skew_dup_q_incremental_dedup":{"dupskew10":$tSkew,"plain10":$tPlain,""" +
        s""""ratio":${tSkew / tPlain}}"""
    }
    val straws = Seq(
      "chunk_window" -> (() => Bench.force(naiveChunkWindow(spark, dSkew))),
      "span_window" -> (() => Bench.force(naiveSpanWindow(spark, dSkew))))
    val strawRows = straws.map { case (name, f) =>
      f() // warmup
      val t = time3(f())
      println(f"[scaleprobe] skew/strawman_$name%-13s skew10=$t%6.2fs")
      s""""skew_strawman_$name":{"skew10":$t}"""
    }
    (deskewed :+ dupRow) ++ strawRows
  }

  // ---- BPE round batching ----------------------------------------------

  /** Vocab-scale BPE round cost: real tokenizers learn k ≈ 30 000 merges
    * and the per-round driver latency dominates, so the batched trainer
    * (top-m symbol-disjoint merges per corpus pass) must cut wall-time
    * ~m× at equal k. Measured at k=100 on the 1× corpus, single run
    * each (a k=100 training run is its own repetition — 100 rounds vs
    * ~10 batched rounds of identical per-round machinery).
    */
  private def bpeProbe(spark: SparkSession, d1: String): Seq[String] = {
    import graft.operators.TextOps
    val docs = spark.read.parquet(s"$d1/documents.parquet")
    def once(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n > 0, "BPE probe trained no rules")
      (System.nanoTime() - t0) / 1e9
    }
    val tSeq = once(TextOps.bpeMergesOver(spark, docs, k = 100).count())
    val tBat = once(TextOps.bpeMergesBatchedOver(spark, docs, k = 100, m = 10).count())
    println(f"[scaleprobe] bpe_k100 sequential=$tSeq%6.2fs batched(m=10)=$tBat%6.2fs " +
      f"speedup=${tSeq / tBat}%4.1fx")
    Seq(s""""bpe_k100":{"sequential_s":$tSeq,"batched_s":$tBat,""" +
      s""""speedup":${tSeq / tBat}}""")
  }

  // ---- embeddings / ANN probe ------------------------------------------

  final case class SynthVec(vec_id: Long, embedding: Array[Float], label: Int)

  private def freshVec(r: java.util.Random): Array[Float] =
    Array.fill(64)(r.nextGaussian().toFloat)

  /** Unlike the driver corpus (weak angular structure — true neighbors at
    * cosine 0.26-0.37), this one plants STRONG near-neighbors: every 13th
    * vector is a noised copy of one of the five query vectors, the shape
    * of a real embedding corpus where duplicates sit at high cosine. The
    * ANN probe measures how the occupancy-tuned search behaves on that
    * structure as the corpus grows.
    */
  def synthVec(i: Long): SynthVec = {
    val rnd = rngFor(i * 7919L + 1)
    val emb =
      if (i >= 5 && i % 13 == 0) {
        val base = freshVec(rngFor((i % 5) * 7919L + 1))
        base.map(x => (x + 0.25 * rnd.nextGaussian()).toFloat)
      } else freshVec(rnd)
    SynthVec(i, emb, (i % 20).toInt)
  }

  private def synthesizeEmb(spark: SparkSession, dir: String, n: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet/_SUCCESS"))) return
    import spark.implicits._
    spark.range(0, n).map(i => synthVec(i))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** Deterministic synthetic EVENTS for the tag-index ladder: 20 date
    * partitions, a numeric hot tag `k` in the props JSON (the D6 shape),
    * event_id = the range id (the slice key the ladder splits on).
    */
  private def synthesizeEvents(spark: SparkSession, dir: String,
      n: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/events.parquet/_SUCCESS"))) return
    spark.range(0, n).selectExpr(
      "timestampadd(SECOND, CAST(id % 86400 AS INT), " +
        "timestampadd(DAY, CAST(id % 20 AS INT), TIMESTAMP'2025-01-01 00:00:00')) AS ts",
      "id AS event_id",
      "id % 997 AS user_id",
      "CASE WHEN id % 3 = 0 THEN 'view' WHEN id % 3 = 1 THEN 'click' " +
        "ELSE 'purchase' END AS event_type",
      "CAST(id % 250 AS DOUBLE) AS value",
      """concat('{"k":"', CAST(id % 100 AS STRING), '","site":"s', """ +
        "CAST(id % 7 AS STRING), '\"}') AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Maintained-TagIndex endurance ladder (r13 — the fourth maintained
    * family folded into the shared [[runLadder]] harness, closing the
    * one index that was still one-shot): a maintainer loop feeds 26
    * tagged event slices through [[graft.operators.TagIndex.appendTo]]
    * under the maxSegments=8 date-local auto-compaction policy
    * ([[graft.operators.TagIndex.compactDates]]). Reports the family's
    * standard claims: (a) append latency flat (slice-sized, never
    * corpus-sized); (b) the segment bound held; (c) after EACH
    * compaction the row BAG re-pinned equal to everything folded so far
    * (count + per-event uniqueness — events are bag rows, so this is
    * the exactness claim the tag protocol exists for); (d) the serving
    * gate (the q_tag_filter typed-k read) sampled early vs late must
    * stay proportional to the table, with the pushed-down scan shape.
    */
  private def tagindexEnduranceProbe(spark: SparkSession,
      base: String): Seq[String] = {
    import graft.operators.TagIndex
    import org.apache.spark.sql.functions.col
    val maxSegments = 8
    val d = s"$base/events_x"
    synthesizeEvents(spark, d, 200000L)
    val all = spark.read.parquet(s"$d/events.parquet")
    val root = java.nio.file.Files
      .createTempDirectory("graft-tagindex-endurance").toString + "/events_tagged"
    new java.io.File(root).mkdirs()
    TagIndex.appendTo(root, all.filter(col("event_id") % 3 === 0),
      Some(("probe", "base")))
    val batches = 26
    // event_id is a nonnegative range id, so plain % is the slice key
    def sliceOf(b: Int) = all.filter(col("event_id") % 3 =!= 0 &&
      col("event_id") % batches === b)
    // per-slice row counts precomputed so the consistency re-pin never
    // rides inside a timed batch
    val sliceCounts = (0 until batches).map(b => sliceOf(b).count())
    var expected = all.filter(col("event_id") % 3 === 0).count()
    val slices = (0 until batches).map { b => () => {
      TagIndex.recover(root)
      TagIndex.appendTo(root, sliceOf(b), Some(("probe", s"b$b")))
      expected += sliceCounts(b)
      if (TagIndex.segments(root) > maxSegments)
        TagIndex.compactDates(root, spark, maxSegments, owner = Some("probe"))
    }}
    def consistent(): Boolean = {
      spark.catalog.refreshByPath(root)
      val df = spark.read.parquet(root)
      df.count() == expected &&
        df.select("event_id").distinct().count() == expected
    }
    def serveSample(): Double = {
      spark.catalog.refreshByPath(root)
      val t0 = System.nanoTime()
      spark.read.parquet(root).filter(col("k") > 50)
        .select("event_id", "user_id", "k").count(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    val serveLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    serveSample(): Unit // warmup outside the samples
    val (appendLat, compactLat, maxSeg, compactions, allConsistent) =
      runLadder(slices,
        () => parquetFilesByDir(root, "date="),
        () => TagIndex.segments(root),
        () => consistent(),
        () => serveLat += serveSample(): Unit)
    val early = median(appendLat.take(4))
    val late = median(appendLat.takeRight(4))
    val cMed = if (compactLat.isEmpty) 0.0 else median(compactLat)
    val sEarly = median(serveLat.take(2).toSeq)
    val sLate = median(serveLat.takeRight(2).toSeq)
    println(f"[scaleprobe] tagindex_endurance: " +
      f"batches=${appendLat.size + compactions} " +
      f"append early=$early%5.2fs late=$late%5.2fs ratio=${late / early}%4.2f " +
      f"compactions=$compactions (compact-batch median $cMed%5.2fs) " +
      f"maxSeg=$maxSeg/${maxSegments + 1} consistent=$allConsistent; " +
      f"serving early=$sEarly%5.2fs late=$sLate%5.2fs " +
      f"ratio=${sLate / sEarly}%4.2f")
    require(allConsistent,
      "tag index row bag diverged from the folded slices after a compaction")
    require(maxSeg <= maxSegments + 1,
      s"segment bound violated: $maxSeg > ${maxSegments + 1}")
    Seq(s""""tagindex_endurance":{"append_early":$early,"append_late":$late,""" +
      s""""ratio":${late / early},"compactions":$compactions,""" +
      s""""compact_batch_median":$cMed,"max_segments":$maxSeg,""" +
      s""""bound":${maxSegments + 1},"consistent":$allConsistent,""" +
      s""""serve_early":$sEarly,"serve_late":$sLate,""" +
      s""""serve_ratio":${sLate / sEarly}}""")
  }

  /** Maintained-ROLLUP endurance ladder (r14 — family parity for the
    * routed-MV states now that they take continuous tagged streaming
    * appends): a maintainer loop feeds 26 event slices through
    * [[graft.plans.QuantileRoute.maintainRollup]] (the
    * [[graft.streaming.RollupStream.qhistAppendStream]] per-batch entry
    * — delete-own-tag → day-local compact past maxSegments=8 → tagged
    * blind append). Reports the family-standard gauges: (a) append
    * latency flat (each append is a batch-sized aggregate + staged
    * publish, NO read of existing state — the blind-append claim);
    * (b) the per-day segment bound held; (c) after EACH compaction the
    * rollup's MERGED states re-pinned bit-for-bit against
    * [[graft.plans.QuantileRoute.rollupOf]] over everything folded so
    * far (the histogram-monoid exactness the route serves on); (d) the
    * route-shaped merged read sampled early vs late.
    */
  private def rollupEnduranceProbe(spark: SparkSession,
      base: String): Seq[String] = {
    import graft.plans.QuantileRoute
    import org.apache.spark.sql.functions.col
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val maxSegments = 8
    val d = s"$base/events_roll"
    synthesizeEvents(spark, d, 200000L)
    val all = spark.read.parquet(s"$d/events.parquet")
      .select("ts", "event_id", "event_type", "value")
    val roll = java.nio.file.Files
      .createTempDirectory("graft-rollup-endurance").toString + "/rollup"
    QuantileRoute.rollupOf(all.filter(col("event_id") % 3 === 0))
      .coalesce(1).write.partitionBy("day").parquet(roll)
    val batches = 26
    def sliceOf(b: Int) = all.filter(col("event_id") % 3 =!= 0 &&
      col("event_id") % batches === b)
    var foldedBatches = Seq.empty[Int]
    def foldedFrame() = all.filter(col("event_id") % 3 === 0 ||
      (col("event_id") % 3 =!= 0 &&
        (col("event_id") % batches).isInCollection(foldedBatches.map(_.toLong))))
    val slices = (0 until batches).map { b => () => {
      QuantileRoute.maintainRollup(spark, roll, sliceOf(b),
        ("probe", s"b$b"), maxSegments)
      foldedBatches = foldedBatches :+ b
    }}
    def servedStates(): Map[(String, String), Seq[(Double, Long)]] = {
      import spark.implicits._
      spark.read.parquet(roll)
        .groupBy("event_type", "day")
        .agg(graft.functions.VectorFunctions.qhistMergeState(col("state"))
          .as("state"))
        .select(col("event_type"), col("day").cast("string"), col("state"))
        .as[(String, String, Seq[(Double, Long)])].collect()
        .map { case (t, dy, s) => (t, dy) -> s }.toMap
    }
    def consistent(): Boolean = {
      import spark.implicits._
      val want = QuantileRoute.rollupOf(foldedFrame())
        .select(col("event_type"), col("day").cast("string"), col("state"))
        .as[(String, String, Seq[(Double, Long)])].collect()
        .map { case (t, dy, s) => (t, dy) -> s }.toMap
      spark.catalog.refreshByPath(roll)
      servedStates() == want
    }
    val serveLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    def serveSample(): Unit = {
      // refresh OUTSIDE the timer (the tagindex probe's convention, so
      // the families' serving gauges stay comparable)
      spark.catalog.refreshByPath(roll)
      val t0 = System.nanoTime()
      servedStates(): Unit
      serveLat += (System.nanoTime() - t0) / 1e9
    }
    serveSample(): Unit // warmup outside the samples
    serveLat.clear()
    val (appendLat, compactLat, maxSeg, compactions, allConsistent) =
      runLadder(slices,
        () => parquetFilesByDir(roll, "day="),
        () => QuantileRoute.rollupSegments(roll),
        () => consistent(),
        serveSample _)
    val early = median(appendLat.take(4))
    val late = median(appendLat.takeRight(4))
    val cMed = if (compactLat.isEmpty) 0.0 else median(compactLat)
    val sEarly = median(serveLat.take(2).toSeq)
    val sLate = median(serveLat.takeRight(2).toSeq)
    println(f"[scaleprobe] rollup_endurance: " +
      f"batches=${appendLat.size + compactions} " +
      f"append early=$early%5.2fs late=$late%5.2fs ratio=${late / early}%4.2f " +
      f"compactions=$compactions (compact-batch median $cMed%5.2fs) " +
      f"maxSeg=$maxSeg/${maxSegments + 1} consistent=$allConsistent; " +
      f"serving early=$sEarly%5.2fs late=$sLate%5.2fs")
    require(allConsistent,
      "rollup states diverged from the folded slices after a compaction")
    require(maxSeg <= maxSegments + 1,
      s"segment bound violated: $maxSeg > ${maxSegments + 1}")
    Seq(s""""rollup_endurance":{"append_early":$early,"append_late":$late,""" +
      s""""ratio":${late / early},"compactions":$compactions,""" +
      s""""compact_batch_median":$cMed,"max_segments":$maxSeg,""" +
      s""""bound":${maxSegments + 1},"consistent":$allConsistent,""" +
      s""""serve_early":$sEarly,"serve_late":$sLate,""" +
      s""""serve_ratio":${sLate / sEarly}}""")
  }

  /** Maintained-MediaHashIndex endurance ladder (r13 — the fifth
    * maintained family under the shared [[runLadder]] harness, added the
    * round the family was born so it never lags the others): ONE
    * long-running [[graft.streaming.MediaStream.appendStream]] maintainer
    * fed 25+ document micro-batches under the maxSegments=8 shard-local
    * auto-compaction policy. Standard claims: (a) append latency flat
    * (slice-sized — each batch pays its own decode+hash, never the
    * corpus's); (b) segment bound held; (c) after EACH compaction the
    * artifact's (media_id, h) set re-pinned ≡ the full recompute over
    * everything folded so far; (d) the serving gate (a fixed re-crawl
    * probe band-joined against the artifact) sampled early vs late —
    * flat, because the probe's candidate work is its band collisions,
    * not the corpus.
    */
  private def mediahashEnduranceProbe(spark: SparkSession,
      base: String, n1: Long): Seq[String] = {
    import graft.operators.{MediaHashIndex, MultimodalOps}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val modality = MediaHashIndex.Image
    val maxSegments = 8
    val d1 = s"$base/x1"
    synthesize(spark, d1, n1)
    val all = spark.read.parquet(s"$d1/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val (baseRows, incoming) = all.splitAt(all.length / 3)
    val root = java.nio.file.Files
      .createTempDirectory("graft-mediahash-endurance").toString
    MediaHashIndex.buildInto(root,
      modality.hashesOf(baseRows.toSeq.toDF("doc_id", "text")),
      modality.family)

    def rebuilt(upTo: Int): Set[(Long, Long)] =
      modality.hashesOf((baseRows ++ incoming.take(upTo)).toSeq
          .toDF("doc_id", "text"))
        .as[(Long, Long)].collect().toSet
    def artifact(): Set[(Long, Long)] = {
      spark.catalog.refreshByPath(MediaHashIndex.hashesDir(root))
      MediaHashIndex.load(spark, root, modality.family)
        .as[(Long, Long)].collect().toSet
    }
    // the FIXED serving probe: 5 base documents re-crawled under fresh
    // ids — guaranteed Hamming-0 hits, identical across samples
    val probe = baseRows.take(5).toSeq
      .map { case (id, t) => (900000L + id, t) }.toDF("doc_id", "text")
    def serveSample(): Double = {
      spark.catalog.refreshByPath(MediaHashIndex.hashesDir(root))
      val t0 = System.nanoTime()
      graft.streaming.MediaStream.matchesVsCorpus(probe,
        MediaHashIndex.load(spark, root, modality.family), modality)
        .count(): Unit
      (System.nanoTime() - t0) / 1e9
    }

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = graft.streaming.MediaStream
      .appendStream(stream, root, modality, maxSegments).start()
    val serveLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    var folded = 0
    val per = math.max(incoming.length / 25, 1)
    val slices = incoming.grouped(per).toSeq.map(slice => () => {
      mem.addData(slice.toSeq: _*)
      q.processAllAvailable()
      folded += slice.length
    })
    serveSample(): Unit // warmup outside the samples
    val (appendLat, compactLat, maxSeg, compactions, convergent) =
      try runLadder(slices,
        () => parquetFilesByDir(MediaHashIndex.hashesDir(root), "shard="),
        () => MediaHashIndex.segments(root),
        () => artifact() == rebuilt(folded),
        () => serveLat += serveSample(): Unit)
      finally q.stop()
    val early = median(appendLat.take(4))
    val late = median(appendLat.takeRight(4))
    val cMed = if (compactLat.isEmpty) 0.0 else median(compactLat)
    val sEarly = median(serveLat.take(2).toSeq)
    val sLate = median(serveLat.takeRight(2).toSeq)
    println(f"[scaleprobe] mediahash_endurance: " +
      f"batches=${appendLat.size + compactions} " +
      f"append early=$early%5.2fs late=$late%5.2fs ratio=${late / early}%4.2f " +
      f"compactions=$compactions (compact-batch median $cMed%5.2fs) " +
      f"maxSeg=$maxSeg/${maxSegments + 1} convergent=$convergent; " +
      f"serving early=$sEarly%5.2fs late=$sLate%5.2fs " +
      f"ratio=${sLate / sEarly}%4.2f")
    require(convergent,
      "media hash artifact diverged from the full recompute after a compaction")
    require(maxSeg <= maxSegments + 1,
      s"segment bound violated: $maxSeg > ${maxSegments + 1}")
    Seq(s""""mediahash_endurance":{"append_early":$early,"append_late":$late,""" +
      s""""ratio":${late / early},"compactions":$compactions,""" +
      s""""compact_batch_median":$cMed,"max_segments":$maxSeg,""" +
      s""""bound":${maxSegments + 1},"convergent":$convergent,""" +
      s""""serve_early":$sEarly,"serve_late":$sLate,""" +
      s""""serve_ratio":${sLate / sEarly}}""")
  }

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getAs[Long]("qid"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("nid")).toSet }

  private def annProbe(spark: SparkSession, base: String): Seq[String] = {
    import graft.operators.VectorOps
    // x30 pins the IVF-PQ compressed-scan claim one tier past the point
    // where stage overhead dominates (VERDICT r5 #4)
    for ((tag, n) <- Seq("x1" -> 2000L, "x10" -> 20000L, "x30" -> 60000L)) yield {
      val d = s"$base/emb_$tag"
      synthesizeEmb(spark, d, n)
      // ingest-time index build + occupancy, deliberately untimed
      VectorOps.cachedLshIndex(spark, d, maxBucket = 100000)
      val occ = VectorOps.lshOccupancy(spark, d)
      VectorOps.cachedQueryVecs(spark, d)
      val (pb, mf) = VectorOps.tuneProbeNet(occ, budget = 0.25)
      val pred = VectorOps.predictedCandidateFraction(
        occ, VectorOps.probesPerTable(pb, mf))
      val meas = VectorOps.lshCandidates(spark, d, pb, mf)
        .select("qi", "nid").distinct().count().toDouble / (5 * (n - 1))
      val exact = topSets(VectorOps.cosineTopK(spark, d))
      val got = topSets(VectorOps.annLsh(spark, d, pb, mf))
      val recall = exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size
      def time(f: => Unit): Double = median((1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      })
      VectorOps.cachedPqAssigned(spark, d) // ingest-time PQ encode, untimed
      val ivfGot = topSets(VectorOps.annIvf(spark, d))
      val ivfRecall = exact.map { case (q, truth) =>
        ivfGot.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size
      val pqGot = topSets(VectorOps.annPq(spark, d))
      val pqRecall = exact.map { case (q, truth) =>
        pqGot.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size
      val tBrute = time(Bench.force(VectorOps.cosineTopK(spark, d)))
      val tTuned = time(Bench.force(VectorOps.annLsh(spark, d, pb, mf)))
      val tPq = time(Bench.force(VectorOps.annPq(spark, d)))
      // ingest-dedup contrast: the EXACT incremental embed dedup scores
      // batch×corpus inside label blocks (work grows with the product),
      // while the VectorStream LSH kernel checks a FIXED re-crawl batch
      // against the bucketed index — per-batch cost should stay flat as
      // the corpus grows; that flatness is the 100 TB ingest argument
      val tIncr = time(Bench.force(VectorOps.incrEmbedDedup(spark, d)))
      val sBits = VectorOps.lshBitsFor(n)
      val vIdx = graft.streaming.VectorStream.corpusIndexOf(
        Tables.embeddings(spark, d), sBits).persist()
      vIdx.count() // ingest-time index build, untimed
      val recrawl = (0L until 500L).map { i =>
        val rnd = rngFor(i * 104729L + 5)
        val e = synthVec(i).embedding
        (1000000L + i,
          e.indices.map(j => e(j) + 0.05f * (rnd.nextGaussian().toFloat)).toArray)
      }
      import spark.implicits._
      val batchDf = recrawl.toDF("vec_id", "embedding")
      val tStream = time(Bench.force(graft.streaming.VectorStream
        .candidatesVsCorpus(batchDf, vIdx, sBits)))
      vIdx.unpersist()
      println(f"[scaleprobe] ann $tag%-4s n=$n%6d bits=${occ.bits} " +
        f"net=($pb,$mf) pred=$pred%.3f meas=$meas%.3f recall=$recall%.2f " +
        f"ivf_recall=$ivfRecall%.2f pq_recall=$pqRecall%.2f brute=$tBrute%5.2fs lsh=$tTuned%5.2fs pq=$tPq%5.2fs " +
        f"incr=$tIncr%5.2fs vstream=$tStream%5.2fs")
      s""""ann_$tag":{"n":$n,"bits":${occ.bits},"net":[$pb,$mf],"pred":$pred,""" +
        s""""measured":$meas,"recall":$recall,"pq_recall":$pqRecall,""" +
        s""""brute_s":$tBrute,"lsh_s":$tTuned,"pq_s":$tPq,""" +
        s""""incr_s":$tIncr,"vstream_s":$tStream}"""
    }
  }

  // ---- retrieval / clustering probe ------------------------------------

  /** BM25 with a workload drawn from the probe corpus's own vocabulary
    * (the shipped keyword set does not occur in the synthetic vocab, so
    * the driver-table query would measure an empty hit set here) and
    * distributed k-means on the embedding tiers. BM25's cost should
    * track the query-term hit set, not the corpus; k-means cost per
    * iteration is one corpus assignment pass + a k·dim-bounded shuffle,
    * so the ratio should stay near the data growth, never above it.
    */
  private def retrievalProbe(spark: SparkSession, base: String,
      n1: Long): Seq[String] = {
    import graft.operators.{TextOps, VectorOps}
    def time3(f: => Unit): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })
    // zipf head (w0-w3) + mid (w40s) + tail (w800s) terms, en register —
    // the HEAD workload is the inverted index's worst case (hot-term
    // postings approach the corpus); the TAIL workload below is its
    // design case (rare terms, tiny pruned postings)
    val workload: Seq[(Long, Int, String)] = Seq(
      (1L, 1, "enw0"), (1L, 2, "enw1"), (1L, 3, "enw2"),
      (2L, 1, "enw3"), (2L, 2, "enw41"), (2L, 3, "enw42"),
      (3L, 1, "enw800"), (3L, 2, "enw801"), (3L, 3, "enw43"))
    val tailWorkload: Seq[(Long, Int, String)] = Seq(
      (1L, 1, "enw1800"), (1L, 2, "enw1850"), (1L, 3, "enw1900"),
      (2L, 1, "enw1750"), (2L, 2, "enw1950"), (2L, 3, "enw1990"),
      (3L, 1, "enw1700"), (3L, 2, "enw1650"), (3L, 3, "enw1600"))
    val bm25Rows = Seq("x1" -> n1, "x10" -> n1 * 10).map { case (tag, n) =>
      val d = s"$base/$tag"
      synthesize(spark, d, n)
      val docs = spark.read.parquet(s"$d/documents.parquet")
      def run() = Bench.force(
        TextOps.bm25TopKOver(docs, 10, s"probe-bm25:$tag", workload))
      run() // warmup
      val t = time3(run())
      println(f"[scaleprobe] bm25 $tag%-4s n=$n%6d t=$t%6.2fs")
      tag -> t
    }
    val bm25Json =
      s""""bm25":{"x1":${bm25Rows.head._2},"x10":${bm25Rows.last._2},""" +
        s""""ratio":${bm25Rows.last._2 / bm25Rows.head._2}}"""
    // indexed serving: the one-time index build is ingest-time (untimed,
    // like the ANN index builds); the timed part reads only the workload
    // terms' shards — cost should track the hit set, not the corpus
    val bm25IdxRows = Seq("x1" -> n1, "x10" -> n1 * 10).map { case (tag, n) =>
      val d = s"$base/$tag"
      synthesize(spark, d, n)
      graft.operators.TextIndex.ensure(spark, d) // ingest-time, untimed
      def run() = Bench.force(
        graft.operators.TextIndex.bm25TopKIndexed(spark, d, 10, workload))
      run() // warmup
      val t = time3(run())
      println(f"[scaleprobe] bm25_indexed $tag%-4s n=$n%6d t=$t%6.2fs")
      tag -> t
    }
    val bm25IdxJson =
      s""""bm25_indexed":{"x1":${bm25IdxRows.head._2},"x10":${bm25IdxRows.last._2},""" +
        s""""ratio":${bm25IdxRows.last._2 / bm25IdxRows.head._2}}"""
    // tail-term regime at x10: scan still tokenizes the corpus; the
    // index reads a few rare terms' pruned postings
    val dTail = s"$base/x10"
    val tScanTail = {
      val docs = spark.read.parquet(s"$dTail/documents.parquet")
      def run() = Bench.force(
        TextOps.bm25TopKOver(docs, 10, "probe-bm25-tail", tailWorkload))
      run(); time3(run())
    }
    val tIdxTail = {
      def run() = Bench.force(
        graft.operators.TextIndex.bm25TopKIndexed(spark, dTail, 10, tailWorkload))
      run(); time3(run())
    }
    println(f"[scaleprobe] bm25_tail x10 scan=$tScanTail%6.2fs indexed=$tIdxTail%6.2fs")
    val bm25TailJson =
      s""""bm25_tail_x10":{"scan":$tScanTail,"indexed":$tIdxTail}"""
    // phrase study at x10: positional-index resolution vs a naive
    // token-window scan (the contains()-class plan that must tokenize
    // and slide over EVERY document)
    val phrases: Seq[(Long, Seq[String])] = Seq(
      (1L, Seq("enw0", "enw1")), (2L, Seq("enw2", "enw0")),
      (3L, Seq("enw1", "enw3")))
    val tPhraseIdx = {
      def run() = Bench.force(
        graft.operators.TextIndex.phraseAt(
          spark, graft.operators.TextIndex.ensure(spark, dTail), phrases))
      run(); time3(run())
    }
    val tPhraseScan = {
      import org.apache.spark.sql.functions.{col => c, _}
      val docs = spark.read.parquet(s"$dTail/documents.parquet")
      def naive(): org.apache.spark.sql.DataFrame = {
        val tk = split(c("text"), " ")
        phrases.map { case (qid, ts) =>
          docs.filter(c("text").isNotNull)
            .select(lit(qid).as("qid"), c("doc_id"),
              size(filter(transform(
                sequence(lit(1), greatest(size(tk) - (ts.size - 1), lit(1))),
                i => ts.zipWithIndex.map { case (t, j) =>
                  try_element_at(tk, i + j) === t
                }.reduce(_ && _)), x => x)).cast("long").as("n_occur"))
            .filter(c("n_occur") > 0)
        }.reduce(_ unionByName _).orderBy("qid", "doc_id")
      }
      Bench.force(naive()); time3(Bench.force(naive()))
    }
    println(f"[scaleprobe] phrase x10 scan=$tPhraseScan%6.2fs indexed=$tPhraseIdx%6.2fs " +
      f"speedup=${tPhraseScan / tPhraseIdx}%4.1fx")
    val phraseJson =
      s""""phrase_x10":{"scan":$tPhraseScan,"indexed":$tPhraseIdx,""" +
        s""""speedup":${tPhraseScan / tPhraseIdx}}"""
    val kmRows = Seq("x1" -> 2000L, "x10" -> 20000L).map { case (tag, n) =>
      val d = s"$base/emb_$tag"
      synthesizeEmb(spark, d, n)
      def run() = Bench.force(VectorOps.kmeansAssign(spark, d, k = 8, iters = 5))
      run() // warmup
      val t = time3(run())
      println(f"[scaleprobe] kmeans $tag%-4s n=$n%6d t=$t%6.2fs")
      tag -> t
    }
    val kmJson =
      s""""kmeans":{"x1":${kmRows.head._2},"x10":${kmRows.last._2},""" +
        s""""ratio":${kmRows.last._2 / kmRows.head._2}}"""
    Seq(bm25Json, bm25IdxJson, bm25TailJson, phraseJson, kmJson)
  }

  /** Winnow hash-tier probe (r9): the identical selection under the
    * md5/60-bit ORACLE family vs the xxhash64 PRODUCTION family on the
    * x10 corpus — puts the measured number on the documented "~10× hash
    * cost bought for DuckDB exactness" trade, and on what [[TextOps
    * .WinnowXx]] buys back at ingest scale. Forces the full selection
    * (row-wise; no exchange in either tier).
    */
  private def winnowHashProbe(spark: SparkSession, d10: String): Seq[String] = {
    import graft.operators.TextOps
    def time3(f: => Unit): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })
    val docs = spark.read.parquet(s"$d10/documents.parquet")
    def run(fam: TextOps.WinnowHash) =
      Bench.force(TextOps.winnowOver(docs, 3, 4, fam))
    run(TextOps.WinnowMd5); run(TextOps.WinnowXx) // warmup
    val tMd5 = time3(run(TextOps.WinnowMd5))
    val tXx = time3(run(TextOps.WinnowXx))
    println(f"[scaleprobe] winnow_hash x10 md5=$tMd5%6.2fs xxhash64=$tXx%6.2fs " +
      f"ratio=${tMd5 / tXx}%4.1fx")
    Seq(s""""winnow_hash_x10":{"md5":$tMd5,"xxhash64":$tXx,""" +
      s""""md5_over_xx":${tMd5 / tXx}}""")
  }

  /** LSH index-build skew probe (r9, closing r8's last structural watch
    * item): build the bucket-capped index over a UNIFORM corpus vs a
    * DEGENERATE one where 30% of vectors are bit-identical (every copy
    * lands in the same bucket of every table — the worst case the old
    * single-window cap pinned on one task per table). With the two-phase
    * cap the hot bucket's local phase spreads over all splits, so build
    * time should stay FLAT (~1×) under the degeneracy.
    */
  private def lshSkewProbe(spark: SparkSession): Seq[String] = {
    import spark.implicits._
    import graft.operators.VectorOps
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time3(f: => Unit): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })
    val n = 20000L
    val hot = synthVec(0L)
    val uniform = spark.range(0, n).map(i => synthVec(i))
      .toDF("vec_id", "embedding", "label")
    val planted = spark.range(0, n)
      .map(i => if (i % 10 < 3) hot.copy(vec_id = i) else synthVec(i))
      .toDF("vec_id", "embedding", "label")
    def build(df: org.apache.spark.sql.DataFrame) =
      Bench.force(VectorOps.lshIndexProbe(df))
    build(uniform); build(planted) // warmup
    val tUni = time3(build(uniform))
    val tHot = time3(build(planted))
    println(f"[scaleprobe] lsh_build_skew n=$n uniform=$tUni%6.2fs " +
      f"hot30=$tHot%6.2fs ratio=${tHot / tUni}%4.2f")
    Seq(s""""lsh_build_skew":{"uniform":$tUni,"hot30":$tHot,""" +
      s""""ratio":${tHot / tUni}}""")
  }

  /** knnBlocked cost-model probe (r10, VERDICT r9 #5): the exact
    * blocked-kNN tier costs Σ block² — the probe pins the claim "scales
    * wherever blocks are bounded" with a measurement. Two corpus shapes
    * at x1 → x30:
    *  - BOUNDED blocks (label = i / blockSize, so block COUNT grows at
    *    fixed size 25): Σ block² grows linearly — per-row cost should be
    *    FLAT, the x30/x1 wall-clock ratio ≈ the 30× data growth.
    *  - UNBOUNDED blocks (the ANN synth's 20 fixed labels, so block
    *    SIZE grows 30×): Σ block² grows ~900× — the regime the
    *    docstring sends to [[graft.operators.VectorOps.knnJoin]]'s LSH
    *    tier; measured here only at x1 → x4 to document the quadratic
    *    turn without burning the probe budget on it.
    */
  private def knnBlockedProbe(spark: SparkSession, base: String): Seq[String] = {
    import spark.implicits._
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time3(f: => Unit): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })
    val n1 = 5000L
    def synthBlocked(dir: String, n: Long): Unit = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/embeddings.parquet/_SUCCESS"))) return
      spark.range(0, n)
        .map(i => SynthVec(i, freshVec(rngFor(i * 7919L + 1)), (i / 25L).toInt))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    def run(d: String) =
      Bench.force(graft.operators.VectorOps.knnBlocked(spark, d))
    // bounded blocks: x1 vs x30
    val (b1, b30) = (s"$base/kb_x1", s"$base/kb_x30")
    synthBlocked(b1, n1); synthBlocked(b30, n1 * 30)
    run(b1); run(b30) // warmup
    val t1 = time3(run(b1)); val t30 = time3(run(b30))
    // unbounded blocks (20 fixed labels): x1 vs x4 — Σ block² ∝ n²
    val (u1, u4) = (s"$base/ku_x1", s"$base/ku_x4")
    synthesizeEmb(spark, u1, n1); synthesizeEmb(spark, u4, n1 * 4)
    run(u1); run(u4) // warmup
    val tu1 = time3(run(u1)); val tu4 = time3(run(u4))
    println(f"[scaleprobe] knn_blocked bounded(25/block) x1=$t1%6.2fs " +
      f"x30=$t30%6.2fs ratio=${t30 / t1}%5.2f (data 30x)")
    println(f"[scaleprobe] knn_blocked unbounded(20 labels) x1=$tu1%6.2fs " +
      f"x4=$tu4%6.2fs ratio=${tu4 / tu1}%5.2f (pairs 16x)")
    Seq(s""""knn_blocked_bounded_x30":{"x1":$t1,"x30":$t30,"ratio":${t30 / t1}},""" +
      s""""knn_blocked_unbounded_x4":{"x1":$tu1,"x4":$tu4,"ratio":${tu4 / tu1}}""")
  }

  /** PQ exactsig probe (r10): the exact-int64 PQ twin's two cost
    * centers at x1 vs x10 — (a) the multi-subspace FIT (3 rounds, each
    * one corpus pass + one model-sized shuffle; per-round cost linear
    * in the corpus, driver traffic fixed at subs·codes·subDim rows) and
    * (b) the SEARCH with the fit warm (the per-dataset cache — encode +
    * LUT-ADC explode + two-phase pool + rerank; the compressed scan is
    * one linear pass over 8-byte codes). Both ratios should track data
    * well under 10 (stage overhead dominates at these corpus sizes —
    * the knn_blocked bounded-tier pattern).
    */
  private def pqExactSigProbe(spark: SparkSession, base: String,
      n1: Long): Seq[String] = {
    import graft.operators.VectorOps
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time3(f: => Unit): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })
    val (d1, d10) = (s"$base/pq_x1", s"$base/pq_x10")
    synthesizeEmb(spark, d1, n1); synthesizeEmb(spark, d10, n1 * 10)
    // fit: timed uncached (pqFitQ directly), the index-build cost
    def fit(d: String): Unit =
      VectorOps.pqFitQ(VectorOps.quantizedFor(spark, d), 8, 8, 16, 3,
        s"pqfit:$d:probe")
    fit(d1); fit(d10) // warmup (scan caches, codegen)
    val f1 = time3(fit(d1)); val f10 = time3(fit(d10))
    // search: fit warm via the per-dataset cache — the query-path cost
    VectorOps.cachedPqFit(spark, d1); VectorOps.cachedPqFit(spark, d10)
    def search(d: String): Unit =
      Bench.force(VectorOps.annPqExactSig(spark, d))
    search(d1); search(d10) // warmup
    val s1 = time3(search(d1)); val s10 = time3(search(d10))
    println(f"[scaleprobe] pq_exactsig fit x1=$f1%6.2fs x10=$f10%6.2fs " +
      f"ratio=${f10 / f1}%5.2f (data 10x)")
    println(f"[scaleprobe] pq_exactsig search x1=$s1%6.2fs x10=$s10%6.2fs " +
      f"ratio=${s10 / s1}%5.2f (data 10x)")
    Seq(s""""pq_fit_x10":{"x1":$f1,"x10":$f10,"ratio":${f10 / f1}},""" +
      s""""pq_search_x10":{"x1":$s1,"x10":$s10,"ratio":${s10 / s1}}""")
  }

  /** Maintained-WinnowIndex serving probe (r10, VERDICT r9 #6 + #2):
    * at x10, (a) a GATE-SIZED probe's match report (one 500-doc
    * micro-batch — the WinnowStream per-batch shape) served from the
    * artifact's range-pruned membership read
    * ([[graft.operators.WinnowIndex.membershipFps]]) vs recomputing the
    * corpus fingerprint set per batch — the q_bm25_indexed
    * indexed-vs-recompute number for winnow (the artifact's value is
    * precisely that the CORPUS-side hashing never re-runs; the probe's
    * own hashing is the gate's inherent cost); (b) the range-shard
    * pruning: a small probe (1 doc, 4 docs) touches only the shard
    * dirs its fps fall in — touched-shard bytes over total bytes is the
    * measured read-volume bound (at production shard counts the same
    * probe-fp count prunes proportionally harder).
    */
  private def winnowIndexProbe(spark: SparkSession, base: String,
      n1: Long): Seq[String] = {
    import graft.operators.{TextOps, WinnowIndex}
    import org.apache.spark.sql.functions.col
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time3(f: => Unit): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })
    // fixed 500-doc batch against a 1× and a 10× corpus: the indexed
    // path's cost must track the BATCH (flat across corpus growth),
    // the per-query recompute's the CORPUS (grows with it)
    def tier(tag: String, n: Long): (Double, Double) = {
      val d = s"$base/$tag"
      synthesize(spark, d, n)
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val batch = docs.filter(col("doc_id") % 3 === 0).limit(500)
        .persist()
      batch.count(): Unit // the arrived micro-batch, not part of the timing
      val root = s"$base/winnow-index-probe-v3-$tag"
      if (!new java.io.File(s"${WinnowIndex.fpsDir(root)}/_SUCCESS").exists())
        WinnowIndex.buildInto(root, corpus)
      def indexed(): Unit = {
        val sel = TextOps.winnowOver(batch, 3, 4).select("doc_id", "fp").distinct()
          .persist()
        Bench.force(TextOps.winnowMatchReportFromSel(batch, sel,
          WinnowIndex.membershipFps(spark, root, sel)))
        sel.unpersist(blocking = true)
      }
      def recompute(): Unit =
        Bench.force(TextOps.winnowMatchReport(batch,
          TextOps.winnowOver(corpus, 3, 4).select("fp").distinct()))
      indexed(); recompute() // warmup
      val r = (time3(indexed()), time3(recompute()))
      batch.unpersist(blocking = true)
      r
    }
    val (tIdx1, tRec1) = tier("x1", n1)
    val (tIdx, tRec) = tier("x10", n1 * 10)
    val d10 = s"$base/x10"
    val root = s"$base/winnow-index-probe-v3-x10"
    val batch = spark.read.parquet(s"$d10/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 0).limit(500)
    // pruning: touched-shard bytes for gate-sized probes vs the
    // artifact — ONE set of helpers parameterized by artifact root and
    // cut, so the 64-shard and 512-shard rows measure the identical
    // probe construction (the comparison SCALE.md's claim rests on)
    def shardBytesOf(r: String, ids: Set[Int]): Long =
      Option(new java.io.File(WinnowIndex.fpsDir(r)).listFiles())
        .getOrElse(Array.empty)
        // tolerate dir names that don't parse as pure shard ints (a
        // crashed maintainer's 'shard=N.old-<uuid>' aside) instead of
        // throwing NumberFormatException out of a measurement helper
        .filter(d => d.isDirectory && d.getName.startsWith("shard=") &&
          scala.util.Try(d.getName.stripPrefix("shard=").toInt)
            .toOption.exists(ids.contains))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .map(_.length()).sum
    def snippets(nDocs: Int) = batch.limit(nDocs).select(col("doc_id"),
      org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.slice(
          org.apache.spark.sql.functions.split(col("text"), " "), 1, 12))
        .as("text"))
    def touchedOf(r: String, p: org.apache.spark.sql.DataFrame): (Int, Long) = {
      val bs = WinnowIndex.boundsOf(r, TextOps.WinnowMd5)
      val ids = TextOps.winnowOver(p, 3, 4)
        .select(WinnowIndex.shardOfBounds(col("fp"), bs).as("s"))
        .distinct().collect().map(_.getInt(0)).toSet
      (ids.size, shardBytesOf(r, ids))
    }
    val total = shardBytesOf(root, (0 until 64).toSet)
    val (s1, b1) = touchedOf(root, batch.limit(1))
    val (s4, b4) = touchedOf(root, batch.limit(4))
    // the q_winnow_snippet regime (r11): paste-sized probes — the first
    // 12 tokens of each of 5 docs — carry a handful of fps whose
    // distinct ranges cover FAR fewer shards than any whole-document
    // probe (a 1-doc probe already touches ~half), so bytes-touched
    // tracks the probe's ranges, the payoff the manifest exists for
    val (ss, bs) = touchedOf(root, snippets(5))
    // PRODUCTION-width cut (r11): the same corpus behind a 512-shard
    // manifest — the claim that a fixed-size probe's read fraction
    // falls as the shard count grows, MEASURED instead of asserted
    // (needs the native range_shard kernel: the fold form overflowed
    // Catalyst recursion at this width)
    val rootW = s"$base/winnow-index-probe-v3w-x10"
    // rebuilt UNCONDITIONALLY: this artifact is MUTATED below (append +
    // compact), so a crash in that window would leave a tree whose
    // _SUCCESS still exists — a skip-if-present here would then serve
    // skewed w512 prune/maintenance numbers from the mutated leftover
    graft.operators.Artifacts.rmTree(new java.io.File(rootW))
    WinnowIndex.buildInto(rootW,
      spark.read.parquet(s"$d10/documents.parquet")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 3 =!= 0),
      shards = 512)
    val totalW = shardBytesOf(rootW, (0 until 512).toSet)
    val (sw, bw) = touchedOf(rootW, snippets(5))
    // maintenance at width (r11): a gate-sized append loads a handful
    // of dirs; SHARD-LOCAL compaction rewrites only those, the global
    // rewrite pays the whole artifact — measured side by side on the
    // same appended state. The artifact mutates here, so it is removed
    // afterwards and rebuilt fresh by the next probe run.
    def overweight(): Int =
      Option(new java.io.File(WinnowIndex.fpsDir(rootW)).listFiles())
        .getOrElse(Array.empty)
        .count(dd => dd.isDirectory && dd.getName.startsWith("shard=") &&
          Option(dd.listFiles())
            .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0) > 1)
    def time1(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val appendSlice = snippets(5)
    WinnowIndex.appendTo(rootW, appendSlice)
    val loaded = overweight()
    val tLocal = time1(WinnowIndex.compactShards(rootW, spark))
    WinnowIndex.appendTo(rootW, appendSlice)
    val tGlobal = time1(WinnowIndex.compact(rootW, spark))
    graft.operators.Artifacts.rmTree(new java.io.File(rootW))
    println(f"[scaleprobe] winnow_index prune @512 shards: the same snippet " +
      f"probe touches $sw/512 ($bw%d/$totalW%d B, ${bw * 100.0 / totalW}%4.1f%%)")
    println(f"[scaleprobe] winnow_index maintenance @512: gate append loads " +
      f"$loaded/512 dirs; shard-local compact $tLocal%5.2fs vs global " +
      f"rewrite $tGlobal%5.2fs (${tGlobal / tLocal}%4.1fx)")
    println(f"[scaleprobe] winnow_index 500-doc batch: indexed x1=$tIdx1%5.2fs " +
      f"x10=$tIdx%5.2fs (flat) recompute x1=$tRec1%5.2fs x10=$tRec%5.2fs " +
      f"(grows); x10 speedup=${tRec / tIdx}%4.2fx")
    println(f"[scaleprobe] winnow_index prune: 1-doc probe touches $s1/64 " +
      f"shards ($b1%d/$total%d B), 4-doc $s4/64 ($b4%d B), " +
      f"5x12-token snippet $ss/64 ($bs%d B, ${bs * 100.0 / total}%4.1f%%)")
    Seq(s""""winnow_index_serving":{"indexed_x1":$tIdx1,"indexed_x10":$tIdx,""" +
      s""""recompute_x1":$tRec1,"recompute_x10":$tRec,""" +
      s""""speedup_x10":${tRec / tIdx}},""" +
      s""""winnow_index_prune":{"total_bytes":$total,""" +
      s""""probe1_shards":$s1,"probe1_bytes":$b1,""" +
      s""""probe4_shards":$s4,"probe4_bytes":$b4,""" +
      s""""snippet5_shards":$ss,"snippet5_bytes":$bs,""" +
      s""""w512_total_bytes":$totalW,""" +
      s""""w512_snippet5_shards":$sw,"w512_snippet5_bytes":$bw,""" +
      s""""w512_append_dirs":$loaded,"w512_compact_local":$tLocal,""" +
      s""""w512_compact_global":$tGlobal}""")
  }

  /** PER-DIR parquet-file counts across `<prefix>N` partition dirs —
    * the endurance ladders' compaction detector (r13). Per-dir, not a
    * net total: appends only ADD files to dirs, while a compaction
    * rewrites SOME dir's >bound segments into one — so "any individual
    * dir's count decreased" detects compaction POSITIVELY, where both
    * aggregate proxies have a skew blind spot (max-over-dirs misses a
    * hot dir's 9→1 under a laggard pinned at the bound — the r12 fix;
    * total-count misses it when the same batch's append adds MORE
    * files across many dirs than the few overweight rewrites remove —
    * the r13 ADVICE counterexample, the r12 failure class inverted).
    * A miss would silently skip that compaction's consistency re-pin.
    */
  private def parquetFilesByDir(parent: String,
      prefix: String): Map[String, Int] =
    Option(new java.io.File(parent).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(prefix))
      .map(d => d.getName -> Option(d.listFiles())
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0))
      .toMap

  /** Shared endurance-ladder harness (r12 — extracted from the three
    * per-family copies so the compaction-detection and latency
    * bookkeeping live in ONE audited place, the Artifacts rationale):
    * runs each micro-batch thunk, classifies the batch as append or
    * compaction-batch by the per-dir-decrease detector above, re-pins the
    * caller's consistency check after every compaction, tracks the
    * per-dir segment bound, and samples the caller's serving probe
    * every 5 batches. compactBatchLat is the COMPACTION BATCH's
    * latency — append + rewrite together (the marginal rewrite cost
    * alone is `--index-compact`'s isolated measurement).
    */
  private def runLadder(slices: Seq[() => Unit],
      filesByDir: () => Map[String, Int],
      maxSeg: () => Int, consistent: () => Boolean, sample: () => Unit)
      : (Seq[Double], Seq[Double], Int, Int, Boolean) = {
    val appendLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    val compactBatchLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    var maxSegSeen = 0
    var compactions = 0
    var allConsistent = true
    slices.zipWithIndex.foreach { case (run, bi) =>
      val before = filesByDir()
      val segBefore = maxSeg()
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      val after = filesByDir()
      maxSegSeen = math.max(maxSegSeen, math.max(segBefore, maxSeg()))
      // POSITIVE detection (r13): some dir's own file count fell (a
      // vanished dir counts as 0 — a re-cut rewrote it). Appends only
      // add files per dir, so this cannot trigger on a pure append and
      // cannot be masked by one (the net-total detector's blind spot).
      if (before.exists { case (dir, n) => after.getOrElse(dir, 0) < n }) {
        compactions += 1
        compactBatchLat += dt
        if (!consistent()) allConsistent = false
      } else appendLat += dt
      if (bi % 5 == 0) sample()
    }
    (appendLat.toSeq, compactBatchLat.toSeq, maxSegSeen, compactions,
      allConsistent)
  }

  /** Maintained-TrainedAnn endurance ladder (r14 — the trained-model
    * family's parity with the five index families): ONE long-running
    * [[graft.streaming.VectorStream.trainedIvfMaintainerStream]]
    * maintainer fed 27 embedding micro-batches (2800 incoming vectors
    * in slices of ~107), each SLICE-probed for drift against the stored
    * codebook ([[graft.operators.TrainedAnn.maintainIvfBatch]]); the
    * last HALF of the incoming traffic (= the corpus's last third,
    * vec_id ≥ 2n/3) is a PLANTED 2x distribution shift, so at least one
    * refit fires mid-ladder. The trained family's claims under
    * continuous ingest:
    *  (a) in-distribution batches never refit (probe-only, one
    *      map-only slice pass — latency flat across the ladder);
    *  (b) the planted shift fires the refit ON ITS OWN BATCH (the
    *      slice-probe's point: the signal is not diluted by the
    *      settled corpus);
    *  (c) after EACH refit the published model re-pins bit-for-bit
    *      against the deterministic full fit over everything folded so
    *      far (the convergence claim that keeps the exactsig oracles
    *      green), and nProbe=2 serving recall over the grown corpus
    *      holds the family's 0.4 floor;
    *  (d) the serving search sampled every 5 batches — grows only with
    *      the corpus's in-list populations (the fixed-k IVF contract),
    *      never steps with segment count (there are no segments: refits
    *      REPLACE the model wholesale, which is the compaction analog
    *      here — the ladder's detector keys on the model GENERATION the
    *      artifact now records).
    */
  private def trainedAnnEnduranceProbe(spark: SparkSession,
      base: String): Seq[String] = {
    import graft.operators.{TrainedAnn, VectorOps}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val (k, iters) = (8, 3)
    val n = 4200L
    val shiftStart = n * 2 / 3
    // corpus with a PLANTED distribution shift: UNIT-NORMALIZED vectors
    // (the exact-int64 family's scale contract — quantizeExpr is
    // trunc(x·1e7), and the inertia SUM over thousands of raw-gaussian
    // vectors would overflow int64) with the last third re-embedded at
    // 2x scale. The full file is on disk because the recall re-pin's
    // payload joins read the dataset by vec_id.
    val d = s"$base/tann_shift"
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet/_SUCCESS")))
      spark.range(0, n).map { i =>
        val v = synthVec(i)
        val nrm = math.sqrt(v.embedding.map(x => x.toDouble * x).sum).toFloat
        val unit = v.embedding.map(x => if (nrm == 0) x else x / nrm)
        val emb = if (i >= shiftStart) unit.map(_ * 2.0f) else unit
        (i, emb.toSeq, v.label)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val all = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val (baseRows, incoming) = all.splitAt(all.length / 3)
    val root = java.nio.file.Files
      .createTempDirectory("graft-tann-endurance").toString
    TrainedAnn.buildIvfInto(root, baseRows.toSeq.toDF("vec_id", "embedding"),
      k, iters, "tann-ladder-fit0")

    var folded = 0
    def accumulated() = (baseRows ++ incoming.take(folded)).toSeq
      .toDF("vec_id", "embedding")
    def cents() = TrainedAnn.requireModel(root, "ivf_exactsig").ivfCents
    def assignedUnder(c: IndexedSeq[Seq[Long]]) =
      VectorOps.assignQForTest(VectorOps.quantized(accumulated()), c)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("qid"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("nid")).toSet }
    // nProbe=2 recall vs the all-lists exact truth over the corpus
    // folded so far — the serving-quality re-pin after each refit
    def recallNow(): Double = {
      val c = cents()
      val a = assignedUnder(c)
      val truth = topSets(VectorOps.annIvfExactSigWith(spark, d, c, a,
        nProbe = k, topK = 10))
      val got = topSets(VectorOps.annIvfExactSigWith(spark, d, c, a,
        nProbe = 2, topK = 10))
      val rs = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      if (rs.isEmpty) 1.0 else rs.sum / rs.size
    }
    def serveSample(): Double = {
      val c = cents()
      val t0 = System.nanoTime()
      VectorOps.annIvfExactSigWith(spark, d, c, assignedUnder(c),
        nProbe = 2, topK = 10).count(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    // refit ≡ deterministic full fit over everything folded so far —
    // the bit-for-bit convergence claim behind the exactsig oracles
    def modelConvergent(): Boolean =
      cents() == VectorOps.kmeansFitOver(accumulated(), k, iters,
        s"tann-ladder-repin-$folded")._1

    val maintained = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Double, Boolean)]
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.streaming.VectorStream.trainedIvfMaintainerStream(
      stream, root, () => accumulated(), k, iters, "tann-ladder",
      (bid, ratio, refit) => maintained += ((bid, ratio, refit))).start()
    val serveLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    val recalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val per = math.max(incoming.length / 26, 1)
    val slices = incoming.grouped(per).toSeq.map(slice => () => {
      // fold BEFORE the batch runs: a refit fired inside this batch
      // must fit over a corpus that includes the batch itself
      folded += slice.length
      mem.addData(slice.toSeq: _*)
      q.processAllAvailable()
    })
    serveSample(): Unit // warmup outside the samples
    // the model has no segment dirs — refits REPLACE it wholesale, so
    // the ladder's "some dir's count fell" compaction detector keys on
    // the recorded model GENERATION (monotone per refit), encoded
    // descending so a bump reads as a decrease
    def genGauge(): Map[String, Int] = Map("model" ->
      (Int.MaxValue - TrainedAnn.loadModel(root).map(_.gen).getOrElse(0L).toInt))
    val (probeLat, refitLat, _, refits, convergent) =
      try runLadder(slices, genGauge _, () => 0,
        () => { val r = recallNow(); recalls += r
          modelConvergent() && r >= 0.4 },
        () => serveLat += serveSample(): Unit)
      finally q.stop()
    val shiftBatch = maintained.toSeq
      .find { case (_, _, refit) => refit }.map(_._1).getOrElse(-1L)
    val early = median(probeLat.take(4))
    val late = median(probeLat.takeRight(4))
    val rMed = if (refitLat.isEmpty) 0.0 else median(refitLat)
    val sEarly = median(serveLat.take(2).toSeq)
    val sLate = median(serveLat.takeRight(2).toSeq)
    val inDistMax = maintained.toSeq.takeWhile(!_._3).map(_._2)
      .foldLeft(0.0)(math.max)
    val shiftRatio = maintained.toSeq.find(_._3).map(_._2).getOrElse(0.0)
    println(f"[scaleprobe] trainedann_endurance: " +
      f"batches=${probeLat.size + refits} " +
      f"probe early=$early%5.2fs late=$late%5.2fs ratio=${late / early}%4.2f " +
      f"refits=$refits (refit-batch median $rMed%5.2fs, first at batch " +
      f"$shiftBatch) in-dist drift<=$inDistMax%.3f shift drift=$shiftRatio%.1f " +
      f"convergent=$convergent recalls=${recalls.map(r => f"$r%.2f").mkString(",")} " +
      f"serving early=$sEarly%5.2fs late=$sLate%5.2fs ratio=${sLate / sEarly}%4.2f")
    require(refits >= 1, "the planted shift never fired a refit")
    require(maintained.toSeq.take(8).forall(!_._3),
      "an in-distribution batch fired a spurious refit")
    require(inDistMax <= TrainedAnn.refitBound,
      f"in-distribution drift $inDistMax%.3f crossed the refit bound")
    require(convergent,
      "a refit diverged from the deterministic full fit, or recall fell " +
        "below the 0.4 floor")
    Seq(s""""trainedann_endurance":{"probe_early":$early,"probe_late":$late,""" +
      s""""ratio":${late / early},"refits":$refits,""" +
      s""""refit_batch_median":$rMed,"first_refit_batch":$shiftBatch,""" +
      s""""in_dist_drift_max":$inDistMax,"shift_drift":$shiftRatio,""" +
      s""""recall_min":${if (recalls.isEmpty) 1.0 else recalls.min},""" +
      s""""serve_early":$sEarly,"serve_late":$sLate,""" +
      s""""convergent":$convergent}""")
  }

  /** Maintained-VectorIndex endurance ladder (r11, the RocksDB-endurance
    * analog for the vector artifact): ONE long-running
    * [[graft.streaming.VectorStream.appendStream]] maintainer fed
    * fixed-size micro-batches under the maxSegments=8 auto-compaction
    * policy, across enough batches to trigger several compactions.
    * Reports (a) per-batch append latency early vs late — must stay
    * flat: appends are slice-sized, never corpus-sized; (b) the segment
    * bound held throughout (≤ maxSegments+1: one append past the bound
    * triggers the compact that restores 1); (c) compaction count and
    * median compact-batch latency (the amortized cost of file economy);
    * (d) after EACH compaction, the artifact's entries re-pinned
    * bit-for-bit against a full rebuild over everything folded so far —
    * the convergence claim under continuous ingest, not just one cycle.
    */
  private def vindexEnduranceProbe(spark: SparkSession,
      base: String): Seq[String] = {
    import graft.operators.{VectorIndex, VectorOps}
    import org.apache.spark.sql.functions.{col, sqrt}
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val (maxBucket, bits, maxSegments) = (64, 8, 8)
    val d = s"$base/emb_x10"
    synthesizeEmb(spark, d, 20000L)
    val all = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val rows = all.as[(Long, Seq[Float])].collect().sortBy(_._1)
    val (baseRows, incoming) = rows.splitAt(rows.length / 3)
    val root = java.nio.file.Files
      .createTempDirectory("graft-vindex-endurance").toString
    VectorIndex.buildInto(root, baseRows.toSeq.toDF("vec_id", "embedding"),
      maxBucket, bits)

    def rebuildKeys(upTo: Int): Set[(Int, Long, Long)] = {
      val folded = (baseRows ++ incoming.take(upTo)).toSeq
        .toDF("vec_id", "embedding")
        .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(
          col("embedding"), col("embedding"))))
      VectorOps.lshIndex(folded, maxBucket, bits)
        .select(col("t").cast("int"), col("bucket").cast("long"), col("nid"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    }
    def artifactKeys(): Set[(Int, Long, Long)] = {
      spark.catalog.refreshByPath(VectorIndex.indexDir(root))
      spark.read.parquet(VectorIndex.indexDir(root))
        .dropDuplicates("t", "bucket", "nid")
        .select(col("t").cast("int"), col("bucket").cast("long"), col("nid"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    }

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDS
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.streaming.VectorStream
      .appendStream(stream, root, maxSegments).start()
    var folded = 0
    val per = math.max(incoming.length / 24, 1)
    val slices = incoming.grouped(per).toSeq.map(slice => () => {
      mem.addData(slice.toSeq: _*)
      q.processAllAvailable()
      folded += slice.length
    })
    val (appendLat, compactLat, maxSeg, compactions, convergent) =
      try runLadder(slices,
        () => parquetFilesByDir(VectorIndex.indexDir(root), "t="),
        () => VectorIndex.segments(root),
        // re-pin the convergence claim at the very compaction point
        () => artifactKeys() == rebuildKeys(folded),
        () => ())
      finally q.stop()
    val early = median(appendLat.take(4))
    val late = median(appendLat.takeRight(4))
    val cMed = if (compactLat.isEmpty) 0.0 else median(compactLat)
    println(f"[scaleprobe] vindex_endurance batches=${appendLat.size + compactions} " +
      f"append early=$early%5.2fs late=$late%5.2fs ratio=${late / early}%4.2f " +
      f"compactions=$compactions (compact-batch median $cMed%5.2fs) " +
      f"maxSeg=$maxSeg/${maxSegments + 1} convergent=$convergent")
    require(convergent, "artifact diverged from the full rebuild after a compaction")
    require(maxSeg <= maxSegments + 1,
      s"segment bound violated: $maxSeg > ${maxSegments + 1}")
    Seq(s""""vindex_endurance":{"append_early":$early,"append_late":$late,""" +
      s""""ratio":${late / early},"compactions":$compactions,""" +
      s""""compact_batch_median":$cMed,"max_segments":$maxSeg,""" +
      s""""bound":${maxSegments + 1},"convergent":$convergent}""")
  }

  /** Maintained-AnnServing endurance ladder (r14; r15 runs it at BOTH
    * families — the repo's own family-parity rule: PQ shares the
    * machinery but its rows carry the codes array instead of a label
    * int, so compaction economics deserve their own measurement): ONE
    * long-running [[graft.streaming.VectorStream.annServingAppendStream]]
    * maintainer at the given assignment family, fed 25+ fixed-size
    * micro-batches of (vec_id, embedding, label) rows under the
    * maxSegments=8 list-local auto-compaction policy. Reports the
    * family-standard gauges: (a) per-batch append latency early vs late
    * (must stay flat — each append is a slice-sized map-only
    * assign-to-existing-list pass, never a corpus re-read); (b) the
    * per-list segment bound held; (c) compaction count + median
    * compact-batch latency; (d) after EACH compaction, the artifact's
    * (nid, cid, label) set re-pinned against the direct full assignment
    * over everything folded so far — exact convergence is the
    * value-idempotence argument (cid is a pure function of
    * (vector, codebook), the codebook is pinned for the stream's life);
    * (e) serving latency sampled through the gate-checked
    * [[graft.operators.AnnServing.load]] path every 5 batches.
    */
  private def annServingEnduranceProbe(spark: SparkSession,
      base: String,
      family: graft.operators.AnnServing.Family): Seq[String] = {
    import graft.operators.{AnnServing, VectorOps}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val maxSegments = 8
    val d = s"$base/emb_annserv"
    synthesizeEmb(spark, d, 20000L)
    val all = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    val rows = all.as[(Long, Seq[Float], Int)].collect().sortBy(_._1)
    val (baseRows, incoming) = rows.splitAt(rows.length / 3)
    val root = java.nio.file.Files
      .createTempDirectory("graft-annserv-endurance").toString
    val model = family.modelFpOf(spark, d)
    def framed(rs: Seq[(Long, Seq[Float], Int)]) =
      rs.toDF("vec_id", "embedding", "label")
    AnnServing.buildInto(root,
      family.rowsOf(spark, d, framed(baseRows.toSeq)),
      family, model)

    // convergence key: (nid, cid, payload) — the payload column is the
    // family's extra (label int at IVF, codes array at PQ), rendered
    // canonically so one extractor serves both
    def keyed(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
      df.select(col("nid"), col("cid").cast("int"),
          col(family.extraCol).cast("string"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSet
    def rebuildKeys(upTo: Int): Set[(Long, Int, String)] =
      keyed(family.rowsOf(spark, d,
        framed((baseRows ++ incoming.take(upTo)).toSeq)))
    def artifactKeys(): Set[(Long, Int, String)] = {
      spark.catalog.refreshByPath(AnnServing.assignDir(root))
      keyed(spark.read.parquet(AnnServing.assignDir(root))
        .dropDuplicates("nid"))
    }
    val servingLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    def sampleServing(): Unit = {
      spark.catalog.refreshByPath(AnnServing.assignDir(root))
      val t0 = System.nanoTime()
      AnnServing.load(spark, root, family, model).count(): Unit
      servingLat += (System.nanoTime() - t0) / 1e9
    }

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val stream = mem.toDS
      .select(col("_1").as("vec_id"), col("_2").as("embedding"),
        col("_3").as("label"))
    val q = graft.streaming.VectorStream
      .annServingAppendStream(stream, root, family, d, maxSegments)
      .start()
    var folded = 0
    val per = math.max(incoming.length / 24, 1)
    val slices = incoming.grouped(per).toSeq.map(slice => () => {
      mem.addData(slice.toSeq: _*)
      q.processAllAvailable()
      folded += slice.length
    })
    val (appendLat, compactLat, maxSeg, compactions, convergent) =
      try runLadder(slices,
        () => parquetFilesByDir(AnnServing.assignDir(root), "cid="),
        () => AnnServing.segments(root),
        () => artifactKeys() == rebuildKeys(folded),
        sampleServing _)
      finally q.stop()
    val early = median(appendLat.take(4))
    val late = median(appendLat.takeRight(4))
    val cMed = if (compactLat.isEmpty) 0.0 else median(compactLat)
    val sEarly = median(servingLat.take(2).toSeq)
    val sLate = median(servingLat.takeRight(2).toSeq)
    println(f"[scaleprobe] annserving_endurance(${family.name}) batches=${appendLat.size + compactions} " +
      f"append early=$early%5.2fs late=$late%5.2fs ratio=${late / early}%4.2f " +
      f"compactions=$compactions (compact-batch median $cMed%5.2fs) " +
      f"maxSeg=$maxSeg/${maxSegments + 1} convergent=$convergent " +
      f"serving early=$sEarly%5.2fs late=$sLate%5.2fs")
    require(convergent,
      "ANN serving table diverged from the full assignment after a compaction")
    require(maxSeg <= maxSegments + 1,
      s"segment bound violated: $maxSeg > ${maxSegments + 1}")
    Seq(s""""annserving_endurance_${family.name}":{"append_early":$early,"append_late":$late,""" +
      s""""ratio":${late / early},"compactions":$compactions,""" +
      s""""compact_batch_median":$cMed,"max_segments":$maxSeg,""" +
      s""""bound":${maxSegments + 1},"convergent":$convergent,""" +
      s""""serving_early":$sEarly,"serving_late":$sLate}""")
  }

  /** Maintained-WinnowIndex endurance ladder at PRODUCTION WIDTH (r12 —
    * the `--vindex-endurance` analog the r11 verdict asked for): ONE
    * long-running [[graft.streaming.WinnowStream.appendStream]]
    * maintainer behind a 512-shard manifest, fed 25+ fixed-size
    * micro-batches under the maxSegments=8 shard-local auto-compaction
    * policy, with the PRUNED serving gate sampled between batches.
    * Reports (a) per-batch append latency early vs late (must stay
    * flat: appends are slice-sized); (b) the segment bound held
    * (≤ maxSegments+1); (c) compaction count + compact-BATCH latency
    * (append + rewrite together; the isolated rewrite cost is
    * `--index-compact`), with
    * the fingerprint set re-pinned ≡ a full rebuild over everything
    * folded so far after EACH compaction (the set-preservation claim
    * under continuous ingest); (d) the gate: a FIXED paste-sized
    * probe (5×12-token snippets) served through the same
    * membershipFps + matchReportFromSel kernel
    * [[graft.streaming.WinnowStream.matchesVsIndexPruned]] runs per
    * batch — latency and touched-bytes FRACTION sampled early vs late
    * must stay flat while the corpus grows and compactions fire.
    */
  private def winnowEnduranceProbe(spark: SparkSession,
      base: String, n1: Long): Seq[String] = {
    import graft.operators.{TextOps, WinnowIndex}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val maxSegments = 8
    val d1 = s"$base/x1"
    synthesize(spark, d1, n1)
    val all = spark.read.parquet(s"$d1/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val (baseRows, incoming) = all.splitAt(all.length / 3)
    val root = java.nio.file.Files
      .createTempDirectory("graft-winnow-endurance").toString
    WinnowIndex.buildInto(root, baseRows.toSeq.toDF("doc_id", "text"),
      shards = 512)

    def rebuildFps(upTo: Int): Set[Long] =
      TextOps.winnowOver((baseRows ++ incoming.take(upTo)).toSeq
          .toDF("doc_id", "text"), 3, 4)
        .select("fp").distinct().collect().map(_.getLong(0)).toSet
    def artifactFps(): Set[Long] = {
      spark.catalog.refreshByPath(WinnowIndex.fpsDir(root))
      spark.read.parquet(WinnowIndex.fpsDir(root))
        .select("fp").distinct().collect().map(_.getLong(0)).toSet
    }
    // the FIXED gate probe: first 12 tokens of 5 base docs — identical
    // across samples, so the only moving parts are corpus size and
    // segment count
    val probe = baseRows.take(5).toSeq
      .map { case (id, t) => (id, t.split(" ").take(12).mkString(" ")) }
      .toDF("doc_id", "text")
    def shardBytes(ids: Set[Int]): Long =
      Option(new java.io.File(WinnowIndex.fpsDir(root)).listFiles())
        .getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("shard=") &&
          scala.util.Try(d.getName.stripPrefix("shard=").toInt)
            .toOption.exists(ids.contains))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .map(_.length()).sum
    def totalBytes(): Long = shardBytes((0 until 512).toSet)
    def gateSample(): (Double, Double) = {
      val sel = TextOps.winnowOver(probe, 3, 4)
        .select("doc_id", "fp").distinct().persist()
      sel.count(): Unit
      spark.catalog.refreshByPath(WinnowIndex.fpsDir(root))
      val t0 = System.nanoTime()
      Bench.force(TextOps.winnowMatchReportFromSel(probe, sel,
        WinnowIndex.membershipFps(spark, root, sel)))
      val dt = (System.nanoTime() - t0) / 1e9
      val bs = WinnowIndex.boundsOf(root, TextOps.WinnowMd5)
      val ids = sel.select(WinnowIndex.shardOfBounds(col("fp"), bs).as("s"))
        .distinct().collect().map(_.getInt(0)).toSet
      sel.unpersist(blocking = true)
      (dt, shardBytes(ids).toDouble / totalBytes())
    }

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = graft.streaming.WinnowStream
      .appendStream(stream, root, maxSegments = maxSegments).start()
    val gates = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var folded = 0
    val per = math.max(incoming.length / 25, 1)
    val slices = incoming.grouped(per).toSeq.map(slice => () => {
      mem.addData(slice.toSeq: _*)
      q.processAllAvailable()
      folded += slice.length
    })
    gateSample(): Unit // warmup (JIT + footers) outside the samples
    val (appendLat, compactLat, maxSeg, compactions, convergent) =
      try runLadder(slices,
        () => parquetFilesByDir(WinnowIndex.fpsDir(root), "shard="),
        () => WinnowIndex.segments(root),
        // re-pin set preservation at the very compaction point: the
        // artifact's fingerprint set equals a full rebuild over
        // everything folded so far
        () => artifactFps() == rebuildFps(folded),
        () => gates += gateSample(): Unit)
      finally q.stop()
    val early = median(appendLat.take(4))
    val late = median(appendLat.takeRight(4))
    val cMed = if (compactLat.isEmpty) 0.0 else median(compactLat)
    val gEarly = median(gates.take(2).map(_._1).toSeq)
    val gLate = median(gates.takeRight(2).map(_._1).toSeq)
    val fEarly = median(gates.take(2).map(_._2).toSeq)
    val fLate = median(gates.takeRight(2).map(_._2).toSeq)
    println(f"[scaleprobe] winnow_endurance @512 shards: " +
      f"batches=${appendLat.size + compactions} " +
      f"append early=$early%5.2fs late=$late%5.2fs ratio=${late / early}%4.2f " +
      f"compactions=$compactions (compact-batch median $cMed%5.2fs) " +
      f"maxSeg=$maxSeg/${maxSegments + 1} convergent=$convergent")
    println(f"[scaleprobe] winnow_endurance gate: latency " +
      f"early=$gEarly%5.2fs late=$gLate%5.2fs ratio=${gLate / gEarly}%4.2f; " +
      f"bytes-fraction early=${fEarly * 100}%4.1f%% late=${fLate * 100}%4.1f%%")
    require(convergent,
      "winnow artifact diverged from the full rebuild after a compaction")
    require(maxSeg <= maxSegments + 1,
      s"segment bound violated: $maxSeg > ${maxSegments + 1}")
    Seq(s""""winnow_endurance":{"shards":512,"append_early":$early,""" +
      s""""append_late":$late,"ratio":${late / early},""" +
      s""""compactions":$compactions,"compact_batch_median":$cMed,""" +
      s""""max_segments":$maxSeg,"bound":${maxSegments + 1},""" +
      s""""convergent":$convergent,"gate_early":$gEarly,"gate_late":$gLate,""" +
      s""""gate_ratio":${gLate / gEarly},""" +
      s""""gate_frac_early":$fEarly,"gate_frac_late":$fLate}""")
  }

  /** Maintained-TextIndex endurance ladder (r12 — completing the
    * endurance treatment across all four index families: RocksDB r9,
    * vector r11, winnow r12, text here): ONE long-running
    * [[graft.streaming.TextIndexStream.appendStream]] maintainer fed
    * fixed-size micro-batches under the maxSegments=8 SHARD-LOCAL
    * auto-compaction policy ([[graft.operators.TextIndex.compactShards]]
    * since r12). Reports (a) per-batch append latency early vs late
    * (flat: appends are slice-sized — postings land under their shards,
    * terms/stats re-aggregate old + delta); (b) the segment bound held
    * (≤ maxSegments+1); (c) compaction count, with BM25 serving
    * re-pinned ≡ the raw-scan kernel over everything folded so far
    * after EACH compaction (the maintained-index consistency claim
    * under continuous ingest — the q_bm25_indexed equality, re-proven
    * at every compaction point); (d) indexed-serving latency early vs
    * late (flat: reads prune to the workload terms' shards regardless
    * of corpus growth or segment history).
    */
  private def tindexEnduranceProbe(spark: SparkSession,
      base: String, n1: Long): Seq[String] = {
    import graft.operators.{TextIndex, TextOps}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val maxSegments = 8
    // a synth-corpus keyword workload (the driver workload's terms don't
    // exist in the probe vocabulary): three queries over head tokens
    val wl = Seq(
      (1L, 1, "enw1"), (1L, 2, "enw2"), (1L, 3, "enw3"),
      (2L, 1, "dew1"), (2L, 2, "dew2"), (2L, 3, "dew4"),
      (3L, 1, "frw0"), (3L, 2, "frw5"), (3L, 3, "frw7"))
    val d1 = s"$base/x1"
    synthesize(spark, d1, n1)
    val all = spark.read.parquet(s"$d1/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val (baseRows, incoming) = all.splitAt(all.length / 3)
    val root = java.nio.file.Files
      .createTempDirectory("graft-tindex-endurance").toString + "/idx"
    TextIndex.buildInto(root, baseRows.toSeq.toDF("doc_id", "text"),
      "probe-tidxe-base")

    def served(): Seq[String] =
      TextIndex.bm25At(spark, root, 10, wl).collect().map(_.toString).toSeq
    def rebuilt(upTo: Int): Seq[String] =
      TextOps.bm25TopKOver((baseRows ++ incoming.take(upTo)).toSeq
          .toDF("doc_id", "text"), 10, s"probe-tidxe-rb$upTo", wl)
        .collect().map(_.toString).toSeq
    def serveSample(): Double = {
      val t0 = System.nanoTime()
      Bench.force(TextIndex.bm25At(spark, root, 10, wl))
      (System.nanoTime() - t0) / 1e9
    }

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = graft.streaming.TextIndexStream
      .appendStream(stream, root, "probe-tidxe", maxSegments).start()
    val serveLat = scala.collection.mutable.ArrayBuffer.empty[Double]
    var folded = 0
    val per = math.max(incoming.length / 25, 1)
    val slices = incoming.grouped(per).toSeq.map(slice => () => {
      mem.addData(slice.toSeq: _*)
      q.processAllAvailable()
      folded += slice.length
    })
    serveSample(): Unit // warmup outside the samples
    val (appendLat, compactLat, maxSeg, compactions, consistent) =
      try runLadder(slices,
        () => parquetFilesByDir(s"$root/postings", "tshard="),
        () => TextIndex.postingsSegments(root),
        // re-pin the maintained-index consistency claim at the very
        // compaction point: indexed serving ≡ raw-scan over all docs
        () => served() == rebuilt(folded),
        () => serveLat += serveSample(): Unit)
      finally q.stop()
    val early = median(appendLat.take(4))
    val late = median(appendLat.takeRight(4))
    val cMed = if (compactLat.isEmpty) 0.0 else median(compactLat)
    val sEarly = median(serveLat.take(2).toSeq)
    val sLate = median(serveLat.takeRight(2).toSeq)
    println(f"[scaleprobe] tindex_endurance: " +
      f"batches=${appendLat.size + compactions} " +
      f"append early=$early%5.2fs late=$late%5.2fs ratio=${late / early}%4.2f " +
      f"compactions=$compactions (compact-batch median $cMed%5.2fs) " +
      f"maxSeg=$maxSeg/${maxSegments + 1} consistent=$consistent; " +
      f"serving early=$sEarly%5.2fs late=$sLate%5.2fs " +
      f"ratio=${sLate / sEarly}%4.2f")
    require(consistent,
      "text index diverged from the raw-scan kernel after a compaction")
    require(maxSeg <= maxSegments + 1,
      s"segment bound violated: $maxSeg > ${maxSegments + 1}")
    Seq(s""""tindex_endurance":{"append_early":$early,"append_late":$late,""" +
      s""""ratio":${late / early},"compactions":$compactions,""" +
      s""""compact_batch_median":$cMed,"max_segments":$maxSeg,""" +
      s""""bound":${maxSegments + 1},"consistent":$consistent,""" +
      s""""serve_early":$sEarly,"serve_late":$sLate,""" +
      s""""serve_ratio":${sLate / sEarly}}""")
  }

  /** Shard/table-LOCAL vs GLOBAL compaction for the text and vector
    * index families (r12 — the winnow `compactShards` measurement, now
    * for the other two maintained indexes): after a gate-sized append
    * that loads only a few dirs, the local entry rewrites exactly those
    * while the global entry re-reads the whole artifact — measured side
    * by side on the same appended state. The vector family's table
    * width is 4 (every normal append touches all 4 `t=` dirs — local ≡
    * global there); the asymmetric regime it exists for is a per-table
    * slice append, which is what this probe stages.
    */
  private def indexCompactProbe(spark: SparkSession, base: String,
      n1: Long): Seq[String] = {
    import graft.operators.{Artifacts, TextIndex, VectorIndex, VectorOps}
    import org.apache.spark.sql.functions.{col, sqrt}
    import spark.implicits._
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time1(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // ---- text index at x10: a 2-term gate append loads ≤2/64 shards
    val d10 = s"$base/x10"
    synthesize(spark, d10, n1 * 10)
    val docs = spark.read.parquet(s"$d10/documents.parquet")
      .select(col("doc_id"), col("text"))
    val rootT = s"$base/tindex-compact-probe"
    // rebuilt unconditionally — the probe MUTATES this artifact
    Artifacts.rmTree(new java.io.File(rootT))
    TextIndex.buildInto(rootT, docs, "probe-tidxc")
    def gateDocs(off: Long) = Seq(
      (90000001L + off, "enw1 enw2 enw1"),
      (90000002L + off, "enw2 enw1 enw2")).toDF("doc_id", "text")
    def overweightT(): Int =
      Option(new java.io.File(s"$rootT/postings").listFiles())
        .getOrElse(Array.empty)
        .count(d => d.isDirectory && d.getName.startsWith("tshard=") &&
          Option(d.listFiles())
            .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0) > 1)
    TextIndex.appendTo(rootT, gateDocs(0), "probe-tidxc-a1")
    val loadedT = overweightT()
    val tLocalT = time1(TextIndex.compactShards(rootT, spark))
    TextIndex.appendTo(rootT, gateDocs(10), "probe-tidxc-a2")
    val tGlobalT = time1(TextIndex.compact(rootT, spark))
    Artifacts.rmTree(new java.io.File(rootT))
    // ---- vector index: a t=0-only slice append loads 1/4 table dirs
    val dE = s"$base/emb_x10"
    synthesizeEmb(spark, dE, 20000L)
    val emb = spark.read.parquet(s"$dE/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (maxBucket, bits) = (64, 8)
    val rootV = s"$base/vindex-compact-probe"
    Artifacts.rmTree(new java.io.File(rootV))
    VectorIndex.buildInto(rootV, emb.filter(col("vec_id") % 7 =!= 0),
      maxBucket, bits)
    def appendT0(): Unit =
      VectorOps.capBuckets(
        VectorOps.lshEntries(
          emb.filter(col("vec_id") % 7 === 0)
            .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(
              col("embedding"), col("embedding")))), bits), maxBucket)
        .filter(col("t") === 0)
        .repartition(1).sortWithinPartitions("t", "bucket", "nid")
        .write.mode("append").partitionBy("t")
        .option("compression", "zstd")
        .parquet(VectorIndex.indexDir(rootV))
    appendT0()
    val tLocalV = time1(VectorIndex.compactTables(rootV, spark))
    appendT0()
    val tGlobalV = time1(VectorIndex.compact(rootV, spark))
    Artifacts.rmTree(new java.io.File(rootV))
    println(f"[scaleprobe] tindex compaction: gate append loads $loadedT/64 " +
      f"shards; shard-local $tLocalT%5.2fs vs global $tGlobalT%5.2fs " +
      f"(${tGlobalT / tLocalT}%4.1fx)")
    println(f"[scaleprobe] vindex compaction: t=0 slice append loads 1/4 " +
      f"tables; table-local $tLocalV%5.2fs vs global $tGlobalV%5.2fs " +
      f"(${tGlobalV / tLocalV}%4.1fx)")
    Seq(s""""tindex_compact":{"loaded_shards":$loadedT,"shards":64,""" +
      s""""local":$tLocalT,"global":$tGlobalT,""" +
      s""""ratio":${tGlobalT / tLocalT}},""" +
      s""""vindex_compact":{"loaded_tables":1,"tables":4,""" +
      s""""local":$tLocalV,"global":$tGlobalV,""" +
      s""""ratio":${tGlobalV / tLocalV}}""")
  }

  /** Image perceptual near-dup volume probe (r12): the banded-pair
    * claim MEASURED — candidate pairs out of the 4×16-bit band join vs
    * the all-pairs count it replaces, at 1× and 10×, plus the declared
    * query's end-to-end time. The candidate count is what the banded
    * join actually materializes; for the shape to scale, it must track
    * hash dispersion (true near-dup clusters + the 2⁻¹⁶-per-band random
    * collision floor), not n².
    */
  private def imageNearDupProbe(spark: SparkSession, base: String,
      n1: Long): Seq[String] = {
    import graft.operators.MultimodalOps
    def time3(f: => Unit): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })
    def tier(tag: String, n: Long)
        : (Long, Long, Long, Long, Long, Double, Double, Double, Double) = {
      val d = s"$base/$tag"
      synthesize(spark, d, n)
      val hashed = MultimodalOps.imageHashes(spark, d).persist()
      val nh = hashed.count()
      val cand = MultimodalOps.dhashBandCandidates(hashed, 4).count()
      // the maintained artifact builds from the SAME persisted hash
      // frame (not a second corpus decode — review-found, r13); its
      // ingest cost is deliberately untimed, like every prepare artifact
      import graft.operators.MediaHashIndex
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-mhprobe-$tag").toString
      MediaHashIndex.buildInto(root, hashed, MediaHashIndex.Image.family)
      hashed.unpersist(blocking = true)
      // the audio tier carries its OWN hash count — the two decode
      // paths null independently, so its percentage must never borrow
      // the image denominator
      val ahashed = MultimodalOps.audioHashes(spark, d).persist()
      val nah = ahashed.count()
      val aCand = MultimodalOps.dhashBandCandidates(ahashed, 4).count()
      // the audio artifact builds from the same persisted frame too —
      // modality parity in the indexed-serving measurement
      val aroot = java.nio.file.Files
        .createTempDirectory(s"graft-mhprobe-a$tag").toString
      graft.operators.MediaHashIndex.buildInto(aroot, ahashed,
        graft.operators.MediaHashIndex.Audio.family)
      ahashed.unpersist(blocking = true)
      Bench.force(MultimodalOps.imageNearDup(spark, d)) // warmup
      val t = time3(Bench.force(MultimodalOps.imageNearDup(spark, d)))
      graft.IntraQueryCache.releaseBoundary()
      // the MAINTAINED-artifact serving face at the same tier (r13):
      // the query band-joins 16-byte stored rows; what the artifact
      // amortizes is the DECODE term — the shared banded-join term
      // grows with candidate volume and is paid by both paths (the
      // measured 1x/10x speedups state this honestly, see SCALE.md)
      def indexed(): Unit = Bench.force(
        MultimodalOps.dhashBandPairs(
          MediaHashIndex.load(spark, root, MediaHashIndex.Image.family), 4, 3)
          .orderBy("doc_a", "doc_b"))
      indexed() // warmup
      val ti = time3(indexed())
      // audio: recompute vs indexed at the same tier
      Bench.force(MultimodalOps.audioNearDup(spark, d)) // warmup
      val ta = time3(Bench.force(MultimodalOps.audioNearDup(spark, d)))
      graft.IntraQueryCache.releaseBoundary()
      def aindexed(): Unit = Bench.force(
        MultimodalOps.dhashBandPairs(
          MediaHashIndex.load(spark, aroot, MediaHashIndex.Audio.family), 4, 3)
          .orderBy("doc_a", "doc_b"))
      aindexed() // warmup
      val tai = time3(aindexed())
      (nh, cand, nah, aCand, nh * (nh - 1) / 2, t, ti, ta, tai)
    }
    val (n1h, c1, na1, a1, all1, t1, ti1, ta1, tai1) = tier("x1", n1)
    val (n10h, c10, na10, a10, all10, t10, ti10, ta10, tai10) = tier("x10", n1 * 10)
    val (aAll1, aAll10) = (na1 * (na1 - 1) / 2, na10 * (na10 - 1) / 2)
    println(f"[scaleprobe] image_neardup x1: n=$n1h candidates=$c1 " +
      f"(all-pairs $all1, ${c1 * 100.0 / all1}%6.3f%%) $t1%5.2fs; " +
      f"x10: n=$n10h candidates=$c10 (all-pairs $all10, " +
      f"${c10 * 100.0 / all10}%6.3f%%) $t10%5.2fs ratio=${t10 / t1}%4.2f")
    println(f"[scaleprobe] image_neardup indexed serving: x1 $ti1%5.2fs " +
      f"(recompute/indexed ${t1 / ti1}%4.2fx), x10 $ti10%5.2fs " +
      f"(${t10 / ti10}%4.2fx) — gap growth ${(t10 / ti10) / (t1 / ti1)}%4.2fx")
    println(f"[scaleprobe] audio_neardup banded volume: x1 n=$na1 " +
      f"candidates=$a1 (${a1 * 100.0 / aAll1}%6.3f%%), " +
      f"x10 n=$na10 $a10 (${a10 * 100.0 / aAll10}%6.3f%%); " +
      f"recompute x1 $ta1%5.2fs x10 $ta10%5.2fs, indexed x1 $tai1%5.2fs " +
      f"(${ta1 / tai1}%4.2fx) x10 $tai10%5.2fs (${ta10 / tai10}%4.2fx)")
    Seq(s""""image_neardup":{"n_x1":$n1h,"cand_x1":$c1,"allpairs_x1":$all1,""" +
      s""""t_x1":$t1,"n_x10":$n10h,"cand_x10":$c10,""" +
      s""""allpairs_x10":$all10,"t_x10":$t10,"ratio":${t10 / t1},""" +
      s""""t_indexed_x1":$ti1,"t_indexed_x10":$ti10,""" +
      s""""speedup_x1":${t1 / ti1},"speedup_x10":${t10 / ti10},""" +
      s""""audio_t_x1":$ta1,"audio_t_x10":$ta10,""" +
      s""""audio_t_indexed_x1":$tai1,"audio_t_indexed_x10":$tai10,""" +
      s""""audio_speedup_x1":${ta1 / tai1},"audio_speedup_x10":${ta10 / tai10},""" +
      s""""audio_n_x1":$na1,"audio_cand_x1":$a1,""" +
      s""""audio_n_x10":$na10,"audio_cand_x10":$a10}""")
  }

  /** RocksDB endurance probe (r9): ONE long-running
    * [[graft.streaming.StreamDedup.candidates]] stream under the r8
    * RocksDB session default, fed fixed-size micro-batches while the
    * (band, bucket) keyspace grows 10× — does per-batch latency stay
    * flat as state accumulates, and what does the state store hold?
    * Reports median per-batch latency at the 1× point vs the 10× point
    * (same batch size, so the only moving part is state size) plus the
    * state operator's row count and RocksDB file footprint from the
    * query's own progress metrics.
    */
  private def rocksDbProbe(spark: SparkSession): Seq[String] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rocksprobe").toString
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(
      org.apache.spark.sql.functions.col("_1").as("doc_id"),
      org.apache.spark.sql.functions.col("_2").as("text"))
    val q = graft.streaming.StreamDedup.candidates(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          graft.streaming.StreamDedup.DupHit], _: Long) =>
        Bench.force(df.toDF())
      }.start()
    val batchDocs = 500
    val nBatches = 40
    val lat = scala.collection.mutable.ArrayBuffer.empty[Double]
    def stateNow(): (Long, Long) = {
      val so = q.lastProgress.stateOperators(0)
      val sst = Option(so.customMetrics.get("rocksdbSstFileSize"))
        .map(_.longValue).getOrElse(0L)
      (so.numRowsTotal, sst)
    }
    var at1x = (0L, 0L)
    try {
      for (b <- 0 until nBatches) {
        val docs = (0 until batchDocs).map { j =>
          val i = (b.toLong * batchDocs + j); (i, synthDoc(i).text)
        }
        val t0 = System.nanoTime()
        mem.addData(docs: _*)
        q.processAllAvailable()
        lat += (System.nanoTime() - t0) / 1e9
        if (b == 3) at1x = stateNow()
      }
      val at10x = stateNow()
      // batches 1-3 (post-warmup, 1× state) vs the last 4 (10× state)
      val m1 = median(lat.slice(1, 4).toSeq)
      val m10 = median(lat.takeRight(4).toSeq)
      println(f"[scaleprobe] rocksdb_endurance batch=$batchDocs lat1x=$m1%5.2fs " +
        f"lat10x=$m10%5.2fs ratio=${m10 / m1}%4.2f rows=${at1x._1}->${at10x._1} " +
        f"sst=${at1x._2}->${at10x._2}B")
      Seq(s""""rocksdb_endurance":{"batch_docs":$batchDocs,"batches":$nBatches,""" +
        s""""lat_1x":$m1,"lat_10x":$m10,"ratio":${m10 / m1},""" +
        s""""rows_1x":${at1x._1},"rows_10x":${at10x._1},""" +
        s""""sst_bytes_1x":${at1x._2},"sst_bytes_10x":${at10x._2}}""")
    } finally q.stop()
  }

  /** Pinned-snapshot storage probe (r9): run the prefix-sum families
    * (shard packing, perplexity terciles) across THREE distinct
    * datasets, consuming each, then print the registry's per-family
    * (snapshots, bytes) report — the keep-2 release contract means
    * every family must plateau at ≤2 pinned corpora regardless of how
    * many datasets a session touches (the multi-GB-per-stale-dataset
    * leak class the machinery exists to prevent; release-on-supersede
    * is spec-asserted in IntraQueryCacheSpec, this row makes the
    * session-level footprint observable).
    */
  private def pinnedProbe(spark: SparkSession, base: String,
      n1: Long): Seq[String] = {
    val tiers = Seq("x1" -> n1, "x3" -> n1 * 3, "x10" -> n1 * 10)
    tiers.foreach { case (tag, n) =>
      val d = s"$base/$tag"
      synthesize(spark, d, n)
      Bench.force(SparkEntry.queries("q_shard_pack")(spark, d))
      Bench.force(SparkEntry.queries("q_perplexity_bucket")(spark, d))
    }
    val rep = graft.operators.TextOps.pinnedStorageReport(spark)
    rep.foreach { case (fam, snaps, bytes) =>
      println(f"[scaleprobe] pinned $fam%-40s snapshots=$snaps bytes=$bytes")
    }
    val rows = rep.map { case (fam, snaps, bytes) =>
      s""""${fam.replace("\"", "")}":{"snapshots":$snaps,"bytes":$bytes}"""
    }
    Seq(s""""pinned_after_3_datasets":{${rows.mkString(",")}}""")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/graft-scaleprobe")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the probe's corpora are MBs, which the default 128 MB split size
      // packs into ~one input partition — row-wise operators (which
      // inherit input parallelism, having no exchange) would then run
      // serially and their ratios would measure the packing, not the
      // operator. At real scale input splits grow with volume; a small
      // split size reproduces that width-scales-with-data behavior.
      .config("spark.sql.files.maxPartitionBytes", (1 << 22).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 18).toString)
      // same instants as the UTC-pinned Verify/oracle run
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the default FileContext checkpoint manager shells out (hadoop
      // Shell readlink) and those subprocesses hang in this sandbox —
      // the FileSystem-based manager stays in-process (the TestSpark
      // setting, needed here for the streaming endurance probe)
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n1 = 5000L
    val dirs = Seq("x1" -> n1, "x10" -> n1 * 10).map { case (tag, n) =>
      val d = s"$base/$tag"
      synthesize(spark, d, n)
      tag -> d
    }.toMap
    // --skew / --bpe: run only that tier (diagnosis / SCALE.md refresh)
    if (args.sameElements(Array("--skew"))) {
      val d10 = s"$base/x10"
      synthesize(spark, d10, n1 * 10)
      val rows = skewProbe(spark, base, d10)
      println(s"""{"metric":"scaleprobe_skew",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--bpe"))) {
      val d1 = s"$base/x1"
      synthesize(spark, d1, n1)
      val rows = bpeProbe(spark, d1)
      println(s"""{"metric":"scaleprobe_bpe",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--retrieval"))) {
      val rows = retrievalProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_retrieval",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--pinned"))) {
      val rows = pinnedProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_pinned",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--rocksdb"))) {
      val rows = rocksDbProbe(spark)
      println(s"""{"metric":"scaleprobe_rocksdb",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--lsh-skew"))) {
      val rows = lshSkewProbe(spark)
      println(s"""{"metric":"scaleprobe_lsh_skew",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--winnow-hash"))) {
      val d10 = s"$base/x10"
      synthesize(spark, d10, n1 * 10)
      val rows = winnowHashProbe(spark, d10)
      println(s"""{"metric":"scaleprobe_winnow_hash",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--knn-blocked"))) {
      val rows = knnBlockedProbe(spark, base)
      println(s"""{"metric":"scaleprobe_knn_blocked",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--pq-exactsig"))) {
      val rows = pqExactSigProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_pq_exactsig",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--trainedann-endurance"))) {
      val rows = trainedAnnEnduranceProbe(spark, base)
      println(s"""{"metric":"scaleprobe_trainedann_endurance",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--rollup-endurance"))) {
      val rows = rollupEnduranceProbe(spark, base)
      println(s"""{"metric":"scaleprobe_rollup_endurance",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--annserving-endurance"))) {
      val rows = annServingEnduranceProbe(spark, base,
        graft.operators.AnnServing.Ivf)
      println(s"""{"metric":"scaleprobe_annserving_endurance",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--annserving-endurance-pq"))) {
      val rows = annServingEnduranceProbe(spark, base,
        graft.operators.AnnServing.Pq)
      println(s"""{"metric":"scaleprobe_annserving_endurance_pq",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--vindex-endurance"))) {
      val rows = vindexEnduranceProbe(spark, base)
      println(s"""{"metric":"scaleprobe_vindex_endurance",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--tindex-endurance"))) {
      val rows = tindexEnduranceProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_tindex_endurance",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--mediahash-endurance"))) {
      val rows = mediahashEnduranceProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_mediahash_endurance",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--tagindex-endurance"))) {
      val rows = tagindexEnduranceProbe(spark, base)
      println(s"""{"metric":"scaleprobe_tagindex_endurance",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--winnow-endurance"))) {
      val rows = winnowEnduranceProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_winnow_endurance",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--image-neardup"))) {
      val rows = imageNearDupProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_image_neardup",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--index-compact"))) {
      val rows = indexCompactProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_index_compact",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    if (args.sameElements(Array("--winnow-index"))) {
      val rows = winnowIndexProbe(spark, base, n1)
      println(s"""{"metric":"scaleprobe_winnow_index",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    // --x30 <queries...>: the 30x tier only, for the named queries
    if (args.headOption.contains("--x30")) {
      val qs30 = args.drop(1).toSeq
      require(qs30.nonEmpty && qs30.toSet.subsetOf(SparkEntry.queries.keySet),
        s"--x30 needs known query names; got ${qs30.mkString(", ")}")
      val d30 = s"$base/x30"
      val d1 = s"$base/x1"
      synthesize(spark, d1, n1)
      synthesize(spark, d30, n1 * 30)
      val rows = qs30.map { qn =>
        val fn = SparkEntry.queries(qn)
        Bench.force(fn(spark, d1)); Bench.force(fn(spark, d30)) // warmup
        val t1 = median((1 to 3).map { _ =>
          val t0 = System.nanoTime(); Bench.force(fn(spark, d1))
          (System.nanoTime() - t0) / 1e9
        })
        val t30 = median((1 to 3).map { _ =>
          val t0 = System.nanoTime(); Bench.force(fn(spark, d30))
          (System.nanoTime() - t0) / 1e9
        })
        println(f"[scaleprobe] $qn%-18s x1=$t1%6.2fs x30=$t30%6.2fs ratio=${t30 / t1}%5.2f")
        s""""${qn}_x30":{"x1":$t1,"x30":$t30,"ratio":${t30 / t1}}"""
      }
      println(s"""{"metric":"scaleprobe_x30",${rows.mkString(",")}}""")
      spark.stop(); return
    }
    // optional argv filter: probe only the named queries (diagnosis runs);
    // a misspelled name must fail loudly, not produce an empty probe
    val wanted = if (args.nonEmpty) args.toSet else probeQueries.toSet
    val unknown = wanted.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val qs = SparkEntry.queries.filter { case (k, _) => wanted.contains(k) }
    // warmup both dirs (JIT, codegen, parquet footers)
    dirs.values.foreach(d => qs.foreach { case (_, fn) => Bench.force(fn(spark, d)) })
    val results = for ((name, fn) <- qs.toSeq.sortBy(_._1)) yield {
      val times = dirs.map { case (tag, d) =>
        tag -> median((1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Bench.force(fn(spark, d))
          (System.nanoTime() - t0) / 1e9
        })
      }
      val ratio = times("x10") / times("x1")
      println(f"[scaleprobe] $name%-18s x1=${times("x1")}%6.2fs x10=${times("x10")}%6.2fs ratio=$ratio%5.2f")
      s""""$name":{"x1":${times("x1")},"x10":${times("x10")},"ratio":$ratio}"""
    }
    if (args.nonEmpty) { // diagnosis run: doc-family rows only
      println(s"""{"metric":"scaleprobe","n1":$n1,"n10":${n1 * 10},""" +
        results.mkString(",") + "}")
      spark.stop(); return
    }
    // 30× tier: one more decade-ish past stage-overhead dominance for the
    // batch×corpus cross engine AND the core banded/prefix dedup families
    val d30 = s"$base/x30"
    synthesize(spark, d30, n1 * 30)
    val x30Queries = Seq("q_incremental_dedup", "q_minhash_lsh",
      "q_ngram_jaccard", "q_dup_spans", "q_containment")
    val x30rows = x30Queries.map { qn =>
      val fn = SparkEntry.queries(qn)
      Bench.force(fn(spark, d30)) // warmup the 30x dir for this family
      val t30 = median((1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.force(fn(spark, d30))
        (System.nanoTime() - t0) / 1e9
      })
      val t1 = {
        val t0 = System.nanoTime()
        Bench.force(fn(spark, dirs("x1")))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scaleprobe] $qn%-18s x30=$t30%6.2fs (x1=$t1%5.2fs ratio=${t30 / t1}%5.2f)")
      s""""${qn}_x30":{"x30":$t30,"x1":$t1,"ratio":${t30 / t1}}"""
    }
    val x30row = x30rows.mkString(",")
    val skew = skewProbe(spark, base, dirs("x10"))
    val bpe = bpeProbe(spark, dirs("x1"))
    val sketch = sketchProbe(spark, dirs)
    val ann = annProbe(spark, base)
    val winnowHash = winnowHashProbe(spark, dirs("x10"))
    val lshSkew = lshSkewProbe(spark)
    val knnBlk = knnBlockedProbe(spark, base)
    val winIdx = winnowIndexProbe(spark, base, n1)
    println(s"""{"metric":"scaleprobe","n1":$n1,"n10":${n1 * 10},""" +
      (results ++ Seq(x30row) ++ skew ++ bpe ++ sketch ++ ann ++ winnowHash
        ++ lshSkew ++ knnBlk ++ winIdx).mkString(",") + "}")
    spark.stop()
  }

  /** Sketch-altitude probe (VERDICT r5 #7): the same distinct-count
    * query three ways — exact count(distinct), the built-in
    * approx_count_distinct (HLL++, codegen'd ImperativeAggregate), and
    * the custom [[graft.functions.KmvAgg]] TypedImperativeAggregate —
    * grouped per language over the synth corpus at 1× and 10×. All three
    * shuffle one fixed-size state per (partition, group); the question
    * the numbers answer is whether a custom sketch buys anything over
    * the built-in at the engine's own aggregation altitude (SCALE.md
    * records the verdict).
    */
  private def sketchProbe(spark: SparkSession,
      dirs: Map[String, String]): Seq[String] = {
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.ensureRegistered(spark)
    // high-cardinality distinct key (one per (doc, term) occurrence class,
    // ~5M at x10): the synth vocabulary itself is Zipf-bounded at ~2k
    // terms/lang, where every variant is overhead-bound and the
    // comparison says nothing — sketches earn their keep exactly when
    // the exact path must shuffle the distinct VALUES and they don't
    def tok(d: String) = spark.read.parquet(s"$d/documents.parquet")
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("t"))
      .select(col("lang"), concat_ws(":", col("doc_id"), col("t")).as("term"))
    val variants: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "exact" -> (d => tok(d).groupBy("lang").agg(countDistinct("term"))),
      "hllpp" -> (d => tok(d).groupBy("lang").agg(approx_count_distinct("term"))),
      "kmv" -> (d => tok(d).groupBy("lang").agg(
        graft.functions.VectorFunctions.kmvCountDistinct(xxhash64(col("term"))))))
    for ((name, fn) <- variants) yield {
      val t = dirs.map { case (tag, d) =>
        Bench.force(fn(d)) // warmup
        tag -> ScaleProbe.median((1 to 3).map { _ =>
          val t0 = System.nanoTime(); Bench.force(fn(d)); (System.nanoTime() - t0) / 1e9
        })
      }
      println(f"[scaleprobe] sketch/$name%-6s x1=${t("x1")}%6.2fs x10=${t("x10")}%6.2fs")
      s""""sketch_$name":{"x1":${t("x1")},"x10":${t("x10")}}"""
    }
  }
}
