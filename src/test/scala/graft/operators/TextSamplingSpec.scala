package graft.operators

import java.nio.file.Files
import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sampling-key null parity: Spark's `concat` null-propagates while
  * DuckDB's skips NULL args, so the shared key md5(doc_id ":" text) must
  * coalesce null text to "" — otherwise a null-text document silently
  * drops out of the hash sample (and reorders the stratified ranking) on
  * exactly one engine.
  */
class TextSamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ids whose null-text key md5("<id>:") passes the 1/16 hash gate — these
  // MUST survive sampling; with null-propagating concat they never can
  private val gatedNullIds =
    Iterator.from(1).filter(i => md5hex(s"$i:").startsWith("0"))
      .take(3).map(_.toLong).toSeq

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-docs").toFile.getPath
    val rows = gatedNullIds.map(i => (i, null: String, "xx", "synthetic", 0L)) ++
      (2000L until 2064L).map(i =>
        (i, s"doc number $i body", if (i % 2 == 0) "en" else "de", "synthetic", 18L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("hashSample keeps gate-passing null-text documents") {
    val got = TextOps.hashSample(spark, dir).collect().map(_.getLong(0)).toSet
    val expected = (gatedNullIds.map(i => i -> s"$i:") ++
      (2000L until 2064L).map(i => i -> s"$i:doc number $i body"))
      .collect { case (i, key) if md5hex(key).startsWith("0") => i }.toSet
    assert(gatedNullIds.toSet.subsetOf(got)) // the null-text docs made it
    assert(got == expected) // and the whole gate matches engine-side md5
  }

  test("stratifiedSample ranks every document, null text included") {
    val strat = TextOps.stratifiedSample(spark, dir, k = 1000).collect()
    assert(strat.length == gatedNullIds.length + 64)
    val xx = strat.filter(_.getString(0) == "xx").map(_.getLong(2)).toSet
    assert(xx == gatedNullIds.toSet)
  }

  test("temperatureSample: accepted counts track k*sqrt(stratum size)") {
    // skewed strata: 400 "big" docs vs 25 "small" — temperature-0.5 mixing
    // means acceptance RATES go 3/20 vs 3/5 (small strata up-weighted),
    // and expected accepted counts are k*sqrt(n_s) = 60 vs 15
    val rows = (0L until 400L).map(i => (i, s"big doc $i", "big", "s", 9L)) ++
      (1000L until 1025L).map(i => (i, s"small doc $i", "small", "s", 10L))
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.temperatureSampleOver(docs, k = 3.0)
    val byLang = got.collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // md5-uniform gate: counts are binomial around the expectation —
    // generous 3-sigma-ish bands keep this deterministic-but-robust
    assert(byLang("big") >= 35 && byLang("big") <= 85, byLang.toString)
    assert(byLang("small") >= 6 && byLang("small") <= 24, byLang.toString)
    val rateBig = byLang("big") / 400.0
    val rateSmall = byLang("small") / 25.0
    assert(rateSmall > rateBig * 2, s"mixing inverted: $rateSmall vs $rateBig")
    // deterministic: same corpus, same sample
    assert(TextOps.temperatureSampleOver(docs, k = 3.0).collect().toSeq ==
      got.collect().toSeq)
  }
}
