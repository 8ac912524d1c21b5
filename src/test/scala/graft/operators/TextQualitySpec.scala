package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Value-level quality oracles for the hash-defined near-dup family
  * (minhash LSH, shingled minhash, simhash) — the driver can only
  * rows-check these, so the recall/precision contracts live here, measured
  * against EXACT ground truth at sf0.01 the same way VectorOpsSpec pins the
  * ANN paths to brute-force cosine. Ground truths are all-pairs exact
  * computations over the 500-doc corpus (driver-side, exhaustive — no
  * sampling), so every assertion is against the true answer, not another
  * estimate.
  */
class TextQualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** All-pairs exact Jaccard over per-doc element sets. */
  private def allPairsJaccard(sets: Map[Long, Set[Long]],
      threshold: Double): Map[(Long, Long), Double] = {
    val ids = sets.keys.toArray.sorted
    val out = Map.newBuilder[(Long, Long), Double]
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (sets(ids(i)), sets(ids(j)))
      val inter = a.intersect(b).size
      val jac = inter.toDouble / (a.size + b.size - inter)
      if (jac >= threshold) out += ((ids(i), ids(j)) -> jac)
    }
    out.result()
  }

  private def collectSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  /** Exact distinct-token-hash sets per doc (the q_token_jaccard universe). */
  private lazy val tokenSets: Map[Long, Set[Long]] = collectSets(
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("th"))
      .groupBy("doc_id").agg(collect_list("th").as("ths")))

  /** Exact 3-gram shingle-hash sets per doc (the q_minhash_shingle universe). */
  private lazy val shingleSets: Map[Long, Set[Long]] = collectSets(
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh")))

  test("shingles survive documents shorter than n (ANSI element_at)") {
    val out = Seq((1L, "one two"), (2L, "solo"), (3L, "a b c d"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1).size == 1 && out(2).size == 1) // one partial window each
    assert(out(3).size == 2) // two full 3-gram windows
  }

  test("minhash LSH recall vs exact Jaccard, stratified by true similarity, both hash tiers") {
    val truth = allPairsJaccard(tokenSets, 0.95)
    // the contract is family-independent — pin the md5 oracle tier (the
    // declared q_minhash_lsh) AND the xxhash64 production tier
    for (family <- Seq(TextOps.MinHashMd5, TextOps.MinHashXx)) {
      val cand = pairSet(TextOps.minhashLshWith(spark, dir, family))
      def recallOver(min: Double, max: Double): (Double, Int) = {
        val strat = truth.filter { case (_, j) => j >= min && j < max }.keySet
        if (strat.isEmpty) (1.0, 0)
        else (strat.intersect(cand).size.toDouble / strat.size, strat.size)
      }
      val (rAll, nAll) = recallOver(0.95, 2.0)
      val (rHigh, nHigh) = recallOver(0.98, 2.0)
      info(s"${family.name}: recall $rAll over $nAll truth pairs; " +
        s"$rHigh over $nHigh J>=0.98 pairs")
      // est>=0.9 over 16 hashes at the J=0.95 boundary has ~0.81 catch
      // probability by construction; high-similarity pairs must be near-sure
      assert(rAll >= 0.7, s"${family.name} overall recall $rAll < 0.7")
      assert(rHigh >= 0.9, s"${family.name} J>=0.98 recall $rHigh < 0.9")
    }
  }

  test("minhash LSH precision: every emitted pair is genuinely similar") {
    val emitted = pairSet(TextOps.minhashLsh(spark, dir))
    val js = emitted.toSeq.map { case (a, b) =>
      val (sa, sb) = (tokenSets(a), tokenSets(b))
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
    val meanJ = js.sum / js.size
    val fracHalf = js.count(_ >= 0.5).toDouble / js.size
    info(s"${js.size} pairs: mean exact J $meanJ, frac(J>=0.5) $fracHalf, min ${js.min}")
    assert(meanJ >= 0.6, s"mean exact J $meanJ < 0.6")
    assert(fracHalf >= 0.95, s"frac(J>=0.5) $fracHalf < 0.95")
  }

  test("shingled minhash: recall + precision vs exact shingle Jaccard, both hash tiers") {
    val truth = allPairsJaccard(shingleSets, 0.95)
    for (family <- Seq(TextOps.MinHashMd5, TextOps.MinHashXx)) {
      val emitted = pairSet(TextOps.minhashShingleWith(spark, dir, family))
      val recall =
        if (truth.isEmpty) 1.0
        else truth.keySet.intersect(emitted).size.toDouble / truth.size
      val js = emitted.toSeq.map { case (a, b) =>
        val (sa, sb) = (shingleSets(a), shingleSets(b))
        val inter = sa.intersect(sb).size
        inter.toDouble / (sa.size + sb.size - inter)
      }
      info(s"${family.name}: shingle truth ${truth.size} pairs, emitted " +
        s"${emitted.size}, recall $recall, " +
        s"mean exact J ${if (js.nonEmpty) js.sum / js.size else 1.0}")
      assert(recall >= 0.7, s"${family.name} shingle recall $recall < 0.7")
      // emitted pairs must be truly shingle-similar, not banding accidents
      assert(js.forall(_ >= 0.5),
        s"${family.name} emitted pair below exact shingle J 0.5: ${js.min}")
    }
  }

  test("dedup clustering: transitivity over chain components + singletons") {
    // chain 1-2, 2-3 (1 and 3 never directly paired), separate pair 10-11,
    // singleton 20 — canonical must be the component MINIMUM, transitively.
    // Both labeling strategies must agree: the driver union-find fast path
    // (default) and the distributed min-label loop (forced via threshold 0).
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L)
    for (threshold <- Seq(Long.MaxValue, 0L)) {
      val out = TextOps.clusterPairs(docs, pairs, driverMaxPairs = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == expected, s"driverMaxPairs=$threshold")
    }
  }

  test("dedup clustering: empty pair graph maps every doc to itself") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = TextOps.clusterPairs(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("dedup clustering matches exact ground-truth components at sf0.01") {
    // driver-side union-find over the exact Jaccard truth pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    allPairsJaccard(tokenSets, 0.95).keys.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = tokenSets.keys.map(d => d -> find(d)).toMap
    val got = TextOps.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // the distributed min-label fallback must produce the same components
    // over the same real pair graph (threshold 0 forces it)
    val gotDistributed = TextOps.clusterPairs(
      graft.Tables.documents(spark, dir).select(org.apache.spark.sql.functions.col("doc_id")),
      TextOps.tokenJaccardPairs(spark, dir).select("doc_a", "doc_b"),
      driverMaxPairs = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDistributed == expected)
  }

  test("simhash candidates: sound (verified d<=8) and pigeonhole-complete (d<=7), both hash tiers") {
    // the contract is family-independent — pin it for the md5 oracle
    // tier (the declared q_simhash) AND the xxhash64 production tier
    for (family <- Seq(TextOps.SimHashMd5, TextOps.SimHashXx)) {
      val fps = TextOps.simhashFingerprints(spark, dir, family).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ids = fps.keys.toArray.sorted
      def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
      val within8 = (for {
        i <- ids.indices; j <- (i + 1) until ids.length
        if ham(fps(ids(i)), fps(ids(j))) <= 8
      } yield (ids(i), ids(j))).toSet
      val within7 = within8.filter { case (a, b) => ham(fps(a), fps(b)) <= 7 }
      val emitted = pairSet(TextOps.simhashWith(spark, dir, family))
      info(s"${family.name}: ${within8.size} pairs d<=8 (${within7.size} d<=7); emitted ${emitted.size}")
      // soundness: the in-query hamming verification is exact
      assert(emitted.subsetOf(within8),
        s"${family.name} unsound pairs: ${emitted.diff(within8).take(5)}")
      // completeness: 8x8 banding cannot miss d<=7 (seven flips, eight bands)
      assert(within7.subsetOf(emitted),
        s"${family.name} missed d<=7 pairs: ${within7.diff(emitted).take(5)}")
      val recall8 = if (within8.isEmpty) 1.0
        else within8.intersect(emitted).size.toDouble / within8.size
      info(s"${family.name} d<=8 recall $recall8")
      assert(recall8 >= 0.95, s"${family.name} d<=8 recall $recall8 < 0.95")
    }
  }

  test("simhash64 expression is bit-identical to the explode+groupBy vote definition") {
    // the retired shuffle formulation, recomputed here as ground truth:
    // per doc, each token-hash occurrence votes ±1 per bit; positive
    // votes set the fingerprint bit, vote==0 ties break to 0
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val fp0 = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
      .groupBy("doc_id")
      .agg(bitVotes.head, bitVotes.tail: _*)
    val fpExpr = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val expected = fp0.select(col("doc_id"), fpExpr.as("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TextOps.simhashFingerprints(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("piiScrub redacts emails/IPs/phones with exact counts and bytes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pii").toString
    Seq(
      // id 0: divisible by 2/3/5 → all three injections land, plus an
      // organic email with dots and a plus in the local part
      (0L, "write to alice.smith+x@corp.example.org now", "en", "t", 0L),
      // id 1: no injections — organic IPv4 only
      (1L, "server at 192.168.0.1 port 80", "en", "t", 0L),
      // id 7: no injections — one real phone; 555-12345 must NOT match
      // (\b fails after the 4th digit)
      (7L, "call 555-0199 or 555-12345", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = TextOps.piiScrub(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_email") == 2)
    assert(out(0L).getAs[Long]("n_ip") == 1)
    assert(out(0L).getAs[Long]("n_phone") == 1)
    assert(out(0L).getAs[String]("scrub_md5") == md5hex(
      "write to <EMAIL> now contact <EMAIL> from <IP> call <PHONE>"))
    assert(out(1L).getAs[Long]("n_email") == 0)
    assert(out(1L).getAs[Long]("n_ip") == 1)
    assert(out(1L).getAs[Long]("n_phone") == 0)
    assert(out(1L).getAs[String]("scrub_md5") == md5hex(
      "server at <IP> port 80"))
    assert(out(7L).getAs[Long]("n_phone") == 1)
    assert(out(7L).getAs[String]("scrub_md5") == md5hex(
      "call <PHONE> or 555-12345"))
  }

  test("lmScore and tfidfTerms match hand-computed corpus statistics") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // corpus counts: a=3 b=1 c=1, T=5; df: a=2 b=1 c=1; N=2
    Seq((1L, "a a b", "en", "t", 0L), (2L, "a c", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val lm = TextOps.lmScore(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(lm(1L).getAs[Long]("n_tokens") == 3)
    assert(lm(1L).getAs[Double]("sum_tf") == 7.0) // 2·3 + 1·1
    assert(lm(1L).getAs[Double]("avg_prob") == (7.0 / 3.0) / 5.0)
    assert(lm(2L).getAs[Double]("sum_tf") == 4.0) // 1·3 + 1·1
    assert(lm(2L).getAs[Double]("avg_prob") == (4.0 / 2.0) / 5.0)
    val tf = TextOps.tfidfTerms(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // doc 1: a and b tie at score 2.0 (2·2/2 and 1·2/1) → term order
    assert(tf((1L, 1L)).getAs[String]("term") == "a")
    assert(tf((1L, 2L)).getAs[String]("term") == "b")
    assert(tf((1L, 1L)).getAs[Double]("score") == 2.0)
    // doc 2: c (1·2/1 = 2.0) outranks a (1·2/2 = 1.0)
    assert(tf((2L, 1L)).getAs[String]("term") == "c")
    assert(tf((2L, 2L)).getAs[String]("term") == "a")
    assert(tf((2L, 2L)).getAs[Double]("score") == 1.0)
  }

  test("corpusStats counts null text, duplicates and quality gates per language") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stats").toString
    val tenTok = "aaa bbb ccc ddd eee fff ggg hhh iii jjj" // 10 tokens, len 3
    Seq(
      (1L, tenTok, "en", "t", 0L),
      (2L, null.asInstanceOf[String], "en", "t", 0L), // null text still counted in n_docs
      (3L, tenTok, "en", "t", 0L),                    // exact dup of doc 1
      (4L, "x", "fr", "t", 0L))                       // 1 token → fails quality
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.corpusStats(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_docs") == 3)
    assert(en.getAs[Long]("n_text") == 2)
    assert(en.getAs[Long]("total_tokens") == 20)
    assert(en.getAs[Long]("n_dupes") == 1)
    assert(en.getAs[Long]("n_quality") == 2) // both copies pass the gate
    assert(en.getAs[Double]("avg_tokens") == 10.0)
    val fr = out("fr")
    assert(fr.getAs[Long]("n_dupes") == 0)
    assert(fr.getAs[Long]("n_quality") == 0)
    assert(fr.getAs[Double]("avg_tokens") == 1.0)
  }

  test("corpusStats emits NULL avg_tokens for an all-null-text language") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stats0").toString
    Seq((1L, null.asInstanceOf[String], "xx", "t", 0L),
      (2L, null.asInstanceOf[String], "xx", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val row = TextOps.corpusStats(spark, tmp).collect().head
    assert(row.getAs[Long]("n_docs") == 2)
    assert(row.getAs[Long]("n_text") == 0)
    // 0.0/0.0 would be NaN in Spark and a float64 division artifact in
    // DuckDB; the guarded output is NULL on both engines
    assert(row.isNullAt(row.fieldIndex("avg_tokens")))
  }

  test("vocabGrowth reports prefix vocabulary and token volume at checkpoints") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_growth").toString
    Seq((0L, "a b", "en", "t", 0L), (1L, "a c", "en", "t", 0L),
      (2L, null.asInstanceOf[String], "en", "t", 0L), (3L, "d d", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // m = 4 → buckets=2 checkpoints: cp1 = (4+1) div 2 = 2, cp2 = (8+1) div 2 = 4
    val out = TextOps.vocabGrowth(spark, tmp, buckets = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((2L, 2L, 4L, 3L))) // docs 0,1: 4 tokens, vocab {a,b,c}
    assert(out(2L) == ((4L, 3L, 6L, 4L))) // + doc 3 (null doc 2 skipped): vocab {a,b,c,d}
  }
}
