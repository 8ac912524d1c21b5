package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** As-of join semantics: latest right ≤ left per key, ties match, no Join
  * operator in the plan (the union+window shape is the whole point).
  */
class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)

  private val left = Seq(
    (1L, "a", ts(10)),
    (2L, "a", ts(20)),
    (3L, "a", ts(5)),   // before any right row
    (4L, "b", ts(10)),  // key with no right rows at all
    (5L, "c", ts(30))).toDF("id", "k", "t")

  private val right = Seq(
    ("a", ts(8), 1.0, "x"),
    ("a", ts(20), 2.0, "y"), // exactly simultaneous with id=2 → matches
    ("a", ts(25), 3.0, "z"),
    ("c", ts(1), 9.0, "w")).toDF("k", "t", "v", "s")

  test("latest right at-or-before left per key; multi-column payload atomic") {
    val out = AsofJoin.asof(left, right, keys = Seq("k"), timeCol = "t")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Double]("v")).map(_.toDouble),
        Option(r.getAs[String]("s"))))
    assert(out.toSeq == Seq(
      (1L, Some(1.0), Some("x")),  // t=10 → right t=8
      (2L, Some(2.0), Some("y")),  // tie t=20 matches (>= convention)
      (3L, None, None),            // nothing at or before t=5
      (4L, None, None),            // no right rows for key b
      (5L, Some(9.0), Some("w")))) // far-past right row still carries
  }

  test("the plan contains no Join operator — one key shuffle, one window") {
    val plan = AsofJoin.asof(left, right, Seq("k"), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("property: asof == naive latest-at-or-before on random data") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { round =>
      // small key/time domains force heavy ties and duplicate timestamps
      val l = (1 to 60).map(i =>
        (i.toLong, s"k${rnd.nextInt(4)}", ts(rnd.nextInt(30).toLong)))
      val r0 = (1 to 40).map(_ =>
        (s"k${rnd.nextInt(5)}", ts(rnd.nextInt(30).toLong), rnd.nextInt(100).toDouble))
      // contract: one right row per (key, time)
      val r = r0.groupBy(t => (t._1, t._2)).map { case ((k, t), vs) =>
        (k, t, vs.map(_._3).max) }.toSeq
      val expected = l.map { case (id, k, t) =>
        val cands = r.filter(x => x._1 == k && !x._2.after(t))
        id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2.getTime)._3))
      }.toMap
      val got = AsofJoin.asof(
          l.toDF("id", "k", "t"), r.toDF("k", "t", "v"), Seq("k"), "t")
        .collect()
        .map(row => row.getLong(0) ->
          Option(row.getAs[java.lang.Double]("v")).map(_.toDouble)).toMap
      assert(got == expected, s"round $round mismatch")
    }
  }

  test("as-of equals the quadratic range-join definition on events data") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("pv"))
    val fast = AsofJoin.asof(errors, purchases, Seq("user_id"), "ts")
    // reference semantics: max-time right row ≤ left, via the naive join
    val naive = errors.as("e")
      .join(purchases.as("p"),
        col("e.user_id") === col("p.user_id") && col("p.ts") <= col("e.ts"),
        "left")
      .groupBy(col("e.event_id").as("event_id"))
      .agg(max_by(col("p.pv"), col("p.ts")).as("pv"))
    val joined = fast.select("event_id", "pv").as("f")
      .join(naive.as("n"), Seq("event_id"))
    assert(joined.count() == errors.count())
    assert(joined.filter(!(col("f.pv") <=> col("n.pv"))).count() == 0)
  }
}
