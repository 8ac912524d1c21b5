package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measurement strawman: the PRE-r17 candidate shape of the jaccard
  * pair engine (raw prefix join → candidate-RID dropDuplicates →
  * payload join-backs → exact verify), stage-timed in isolation —
  * `runMain graft.PairProbe [docsDir]`. This is the shape the r17
  * sketch gate replaced; keeping it runnable lets a future round
  * re-measure the tradeoff on whatever data generation it faces
  * (r17 evidence: 1.8M candidates for 2k real pairs at sf0.1 on the
  * 31-token-vocabulary driver data; 10.4M for 2.3k at the 30× probe).
  * Read-only: builds no artifacts, mutates nothing.
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val threshold = 0.95
    val docs0 = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.VectorFunctions
        .hashSetSorted(split(col("text"), " ", -1)).as("toks"))
    val docs = docs0.withColumn("sz", size(col("toks")).cast("long"))
    val groups = docs.groupBy("toks", "sz")
      .agg(collect_list(col("doc_id")).as("ids"), min(col("doc_id")).as("gid"))
      .persist()
    t("groups.count")(println("groups=" + groups.count()))
    val gtok = groups.select(col("gid"), col("sz"), explode(col("toks")).as("th"))
    val df = gtok.groupBy("th").agg(count(lit(1)).as("df"))
    t("df.count")(println("df=" + df.count()))
    val w = Window.partitionBy("gid").orderBy("df", "th")
    val tDec = lit(BigDecimal(threshold.toString))
    val prefix = gtok.join(df, "th")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= floor((lit(BigDecimal(1)) - tDec) * col("sz")) + 1)
      .select("gid", "th", "sz")
      .persist()
    t("prefix.count")(println("prefix=" + prefix.count()))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.th") === col("b.th") && col("a.gid") < col("b.gid") &&
          col("b.sz") >= ceil(col("a.sz") * tDec) &&
          col("a.sz") >= ceil(col("b.sz") * tDec))
      .select(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"))
    t("cand.count (pre-dedup)")(println("cand_raw=" + cand.count()))
    val candD = cand.dropDuplicates("gid_a", "gid_b").persist()
    t("cand.dedup.count")(println("cand=" + candD.count()))
    val inter = candD
      .join(groups.select(col("gid").as("gid_a"), col("toks").as("toks_a"),
        col("sz").as("sz_a"), col("ids").as("ids_a")), "gid_a")
      .join(groups.select(col("gid").as("gid_b"), col("toks").as("toks_b"),
        col("sz").as("sz_b"), col("ids").as("ids_b")), "gid_b")
      .withColumn("common", graft.functions.VectorFunctions
        .sortedIntersectCount(col("toks_a"), col("toks_b")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
    t("inter.count")(println("inter_groups=" + inter.count()))
    val pairs = inter
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("jaccard"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("jaccard"))
    t("pairs.count")(println("near_pairs=" + pairs.count()))
    spark.stop()
  }
}
