package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data-pipeline text operators over `documents` (doc_id, text,
  * lang, source, n_chars): analysis, quality scoring, fingerprinting, and
  * exact/near deduplication.
  *
  * Scale notes: everything is expressed as scans + hash aggregates; the
  * near-dup operators are the interesting ones —
  *  - token-jaccard does an inverted-index self-join (explode on token):
  *    exact, but the token join can blow up on stopword-frequency tokens;
  *    at 100 TB you run [[minhashLsh]] instead (bounded signature size,
  *    band-bucket join touches only collision candidates).
  *  - simhash reduces each doc to one 64-bit fingerprint: near-dup becomes
  *    a cheap fingerprint self-join on band prefixes.
  */
object TextOps {

  private def tokens(text: Column): Column = split(text, " ")

  /** Per-language corpus stats: doc counts, char volume, mean token count. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")

  /** Exact dedup: group by full text, keep the first doc_id (min) per
    * group. At scale, group by a 128-bit text hash instead of the full
    * string to shrink shuffle width — semantics identical (collision-free
    * in practice).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("text")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Document fingerprint: md5 over whitespace-normalized lowercase text —
    * the cheap content-address used by exact dedup at scale.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " ")).cast("binary")).as("fp"))
      .orderBy("doc_id")

  /** English stopwords used by the quality / language heuristics. */
  private val stopwords =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Quality scoring: stopword ratio + mean token length per document
    * (length/punct/stopword family). Single explode + hash aggregate.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(
        (sum(when(col("tok").isin(stopwords: _*), 1).otherwise(0)).cast("double")
          / count(lit(1))).as("stop_ratio"),
        (sum(length(col("tok"))).cast("double") / count(lit(1))).as("avg_tok_len"),
        count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")

  /** Heuristic language ID: docs whose stopword ratio clears a threshold
    * are tagged "en", others "other"; reported against the labeled lang so
    * the oracle checks the whole confusion matrix.
    */
  def langIdHeuristic(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "lang")
      .agg((sum(when(col("tok").isin(stopwords: _*), 1).otherwise(0)).cast("double")
        / count(lit(1))).as("ratio"))
      .withColumn("lang_guess", when(col("ratio") >= 0.05, "en").otherwise("other"))
      .groupBy("lang", "lang_guess")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_guess")

  /** Near-dup by exact token-set Jaccard via an inverted-index self-join.
    * Exact but join-heavy — the oracle-checked baseline for [[minhashLsh]].
    */
  def tokenJaccard(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = tok.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= 0.95)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash + LSH near-dup candidates (the 100 TB dedup path; no SQL
    * oracle — hash-function-defined output, driver does the rows>0 check).
    *
    * k=16 hash functions from seeded xxhash64, 4 bands × 4 rows: docs
    * colliding on any band become candidate pairs; candidates are then
    * verified with the exact minhash-signature agreement estimate.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val numHashes = 16
    val rowsPerBand = 4
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
    // signature: for each seed i, min over tokens of xxhash64(i ++ tok)
    val sigCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("tok"))).as(s"h$i"))
    val sig = tok.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    // LSH: hash each band of the signature to a bucket id
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      sig.select(col("doc_id"), lit(b).as("band"), hash(cols: _*).as("bucket"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
    }.reduce(_ unionByName _)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast("double") / lit(numHashes))
      .filter(col("est_jaccard") >= 0.9)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup (no SQL oracle): 64-bit fingerprint = sign of the
    * per-bit vote over token hashes; near-dups collide within small
    * Hamming distance. One aggregate per doc + a band-prefix self-join.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val fp0 = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
      .groupBy("doc_id")
      .agg(bitVotes.head, bitVotes.tail: _*)
    val fpExpr = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val fp = fp0.select(col("doc_id"), fpExpr.as("simhash"))
    // candidates: equal high-16-bit prefix, then exact hamming <= 8
    val pref = fp.withColumn("prefix", shiftright(col("simhash"), 48))
    pref.as("a").join(pref.as("b"),
        col("a.prefix") === col("b.prefix") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("hamming") <= 8)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }
}
