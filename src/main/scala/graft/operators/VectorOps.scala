package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * Array[Float] len 64, label).
  *
  * Scale notes: the brute-force path broadcasts the (small) query set and
  * streams the corpus once — no corpus shuffle, dot products run inside
  * whole-stage codegen via `zip_with`/`aggregate`. Top-k per query is a
  * window over (n_queries × corpus) rows; at 100 TB you first reduce with
  * the LSH-bucketed variant so only candidate buckets are scored.
  */
object VectorOps {

  /** Elementwise dot product in double precision via the native codegen'd
    * [[graft.functions.DotProduct]] expression (floats widened per element;
    * same sequential ascending fold as the `aggregate(zip_with(...))`
    * formulation, so values are bit-identical — just without the
    * interpreted higher-order-function overhead in the pair-scoring loop).
    * Callers must have run [[VectorFunctions.ensureRegistered]].
    */
  private def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-10 for query vectors vec_id < 5 against the
    * whole corpus. Cosine is rounded to 4 decimals (and ranked on the
    * rounded value, tie-broken by id) so the result is exactly comparable
    * across engines and summation orders.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(spark)
    // norms are materialized once per vector before the pair join, so each
    // scored pair costs exactly one 64-element dot product
    val emb = Tables.embeddings(spark, dir)
      .withColumn("nrm", norm(col("embedding")))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"), col("nrm").as("nn"))
      .join(broadcast(queries), col("qid") =!= col("nid"))
      .withColumn("cosine",
        round(dot(col("qe"), col("ne")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select("qid", "nid", "cosine", "rn")
      .orderBy("qid", "rn")
  }

  /** Near-duplicate pairs by embedding cosine above a threshold, restricted
    * to same-label blocks (blocking keeps the self-join linear-ish; the
    * unblocked exact variant is [[cosineTopK]]'s machinery).
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .withColumn("nrm", norm(col("embedding")))
    emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        round(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cosine") >= 0.35)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** ANN via IVF (inverted file index): deterministic coarse centroids
    * (every corpus/nCentroids-th vector — no RNG, reproducible plan), each
    * vector assigned to its nearest centroid's list by one broadcast-argmax
    * pass, queries probe their `nProbe` nearest lists and are scored
    * exactly only within them. The 100 TB shape: the centroid table is
    * tiny and broadcast, corpus assignment is one scan, and the final join
    * touches ~nProbe/nCentroids of the corpus instead of all of it.
    * (No SQL oracle — recall is index-defined; rows-only check.)
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(spark)
    val nCentroids = 16
    val nProbe = 8 // stride centroids are untrained; probe generously
                   // (a trained k-means codebook would cut this to 2-4)
    val emb = Tables.embeddings(spark, dir)
      .withColumn("nrm", norm(col("embedding")))
    // deterministic coarse centroids: stride-sampled corpus vectors
    val n = emb.count()
    val stride = math.max(1L, n / nCentroids)
    val centroids = emb
      .filter(col("vec_id") % stride === 0 && col("vec_id") / stride < nCentroids)
      .select((col("vec_id") / stride).cast("int").as("cid"),
        col("embedding").as("ce"), col("nrm").as("cn"))
    // assign every vector to its nearest centroid (cosine argmax); the
    // centroid table broadcasts, so assignment is one corpus scan
    val wAssign = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
    val assigned = emb.join(broadcast(centroids))
      .withColumn("sim", dot(col("embedding"), col("ce")) / (col("nrm") * col("cn")))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
    // queries probe their nProbe nearest centroid lists
    val wProbe = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      .join(broadcast(centroids))
      .withColumn("sim", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nProbe)
      .select(col("qid"), col("qe"), col("qn"), col("cid"))
    // exact scoring only inside the probed lists
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    assigned.select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("nrm").as("nn"), col("cid"))
      .join(broadcast(probes), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine",
        round(dot(col("qe"), col("ne")) / (col("qn") * col("nn")), 4))
      .dropDuplicates("qid", "nid")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("qid", "nid", "cosine", "rn")
      .orderBy("qid", "rn")
  }

  /** ANN via random-hyperplane LSH (the scale path; no SQL oracle — bucket
    * assignment is hash-defined). Hyperplanes are derived deterministically
    * from xxhash64 so the plan is reproducible without any driver-side RNG
    * state; each vector lands in one bucket per table, candidates are
    * scored exactly within buckets only.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.ensureRegistered(spark)
    val nBits = 8
    val emb = Tables.embeddings(spark, dir)
    // sign bit j = sign( sum_i e[i] * hyper(j, i) ), hyper in [-0.5, 0.5)
    // derived from xxhash64(j, i) — deterministic, no stored model.
    def hyper(j: Int): Column =
      transform(sequence(lit(0), lit(63)), i =>
        (xxhash64(lit(j), i).cast("double") / lit(Long.MaxValue.toDouble * 2) ))
    val sigBits = (0 until nBits).map { j =>
      when(aggregate(zip_with(col("embedding"), hyper(j), (x, h) =>
        x.cast("double") * h), lit(0.0), (a, v) => a + v) > 0,
        shiftleft(lit(1), j)).otherwise(lit(0))
    }.reduce(_.bitwiseOR(_))
    val bucketed = emb.withColumn("bucket", sigBits)
      .withColumn("nrm", norm(col("embedding")))
    val queries = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val cand = bucketed.select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("nrm").as("nn"), col("bucket"))
      .join(broadcast(queries), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine",
        round(dot(col("qe"), col("ne")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("qid", "nid", "cosine", "rn")
      .orderBy("qid", "rn")
  }
}
