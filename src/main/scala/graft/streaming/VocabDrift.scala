package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming crawl-health monitor: per-(event-time window, language) OOV
  * rate of the incoming document stream against a corpus vocabulary —
  * the in-flight tripwire for "the crawler started pulling markup /
  * garbage / an unexpected language", the streaming twin of the batch
  * [[graft.operators.TextOps.oovRate]] report.
  *
  * Split the lambda way (the [[CorpusStream.mixStream]] model): the
  * vocabulary is a GLOBAL corpus property, so it refreshes batch-side
  * ([[corpusVocab]] — a KB-to-MB artifact at real tokenizer sizes) and
  * rides into the stream as a broadcast static side; the stream side is
  * one explode + stream-static broadcast join + watermarked window
  * aggregate. Per-batch cost tracks the batch's token volume, never the
  * corpus.
  */
object VocabDrift {

  /** Batch-side vocabulary artifact: the top-`v` corpus terms as 64-bit
    * hashes (total frequency desc, term asc — the [[graft.operators
    * .TextOps.oovRate]] order), one `th` column. TakeOrdered top-v,
    * never a full sort; vocabulary-bounded input.
    */
  def corpusVocab(docs: DataFrame, v: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(v)
      .select(xxhash64(col("term")).as("th"))

  /** The monitor: docs stream in as (doc_id, text, lang, time); rows out
    * are (window_start, lang, total_tokens, oov_tokens, oov_rate) per
    * closed event-time window. Append mode — a window's row is final
    * once the watermark passes it, which is what a paging alert wants.
    */
  def oovStream(docs: DataFrame, vocab: DataFrame, bucket: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame =
    docs.filter(col("text").isNotNull)
      .withWatermark("time", watermark)
      .select(col("time"), col("lang"), explode(split(col("text"), " ")).as("term"))
      .withColumn("th", xxhash64(col("term")))
      .join(broadcast(vocab.withColumn("in_v", lit(1))), Seq("th"), "left")
      .groupBy(window(col("time"), bucket), col("lang"))
      .agg(count(lit(1)).as("total_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .select(col("window.start").as("window_start"), col("lang"),
        col("total_tokens"), col("oov_tokens"),
        (col("oov_tokens").cast("double") / col("total_tokens").cast("double"))
          .as("oov_rate"))
}
