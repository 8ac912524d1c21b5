package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact metric line's display names: unique, deterministic, and
  * small enough that the full 103-query map fits the driver's bounded
  * (~2000-char) output capture even under heavy host-noise inflation.
  */
class BenchSpec extends AnyFunSuite {

  test("shortNames are unique, deterministic, and q_-stripped") {
    val names = SparkEntry.queries.keys.toSeq
    val short = Bench.shortNames(names)
    assert(short.keySet == names.toSet)
    assert(short.values.toSeq.distinct.size == names.size,
      "shortened names must stay unique")
    assert(short == Bench.shortNames(names.reverse),
      "shortening must not depend on input order")
    assert(short.forall { case (_, v) => !v.startsWith("q_") })
    // the shortened form is always a prefix of the stripped original
    assert(short.forall { case (k, v) =>
      (if (k.startsWith("q_")) k.drop(2) else k).startsWith(v)
    })
  }

  test("shortNames terminates and stays unique when stripping collides") {
    // "q_foo" and "foo" strip to the same string — those entries must
    // fall back to their full names instead of looping forever
    val short = Bench.shortNames(Seq("q_foo", "foo", "q_bar_baz_quux_long"))
    assert(short.values.toSeq.distinct.size == 3)
    assert(short("q_foo") == "q_foo" && short("foo") == "foo")
    assert(short("q_bar_baz_quux_long") == "bar_baz_qu")
  }

  test("the compact metric line fits the driver's capture window with headroom") {
    val names = SparkEntry.queries.keys.toSeq
    val short = Bench.shortNames(names)
    // worst realistic case: every median takes 4 digits of milliseconds
    // (≥1 s and <10 s per query — far above today's ~0.7 s median)
    val qs = names.sorted
      .map(k => "\"" + short(k) + "\":9999").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":999.999,"unit":"sec",""" +
      s""""queries_ms":$qs}"""
    assert(line.length <= 1950,
      s"metric line too long for the ~2000-char capture tail: ${line.length}")
  }
}
