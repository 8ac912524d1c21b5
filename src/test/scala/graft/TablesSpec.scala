package graft

import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Dataset-fingerprint contract: derived state (tag index, ANN caches,
  * codebooks) is keyed by this value, so any regeneration of the source
  * parquet — including an in-place rewrite that keeps part-file names and
  * the directory inode untouched — must produce a different fingerprint.
  */
class TablesSpec extends AnyFunSuite {

  private def freshTable(): (File, File) = {
    val dir = Files.createTempDirectory("graft-fp").toFile
    val tbl = new File(dir, "documents.parquet")
    assert(tbl.mkdir())
    val part = new File(tbl, "part-00000.parquet")
    Files.write(part.toPath, "aaaa".getBytes): Unit
    assert(part.setLastModified(1700000000000L))
    assert(tbl.setLastModified(1700000100000L))
    (dir, tbl)
  }

  test("fingerprint sees an in-place part rewrite (same names, same dir mtime)") {
    val (dir, tbl) = freshTable()
    val fp1 = Tables.fingerprint(dir.getPath, "documents")
    // regenerator rewrites the part under the same name: length unchanged,
    // only the part file's own mtime moves — the directory mtime does not
    val part = new File(tbl, "part-00000.parquet")
    Files.write(part.toPath, "bbbb".getBytes): Unit
    assert(part.setLastModified(1700000005000L))
    assert(tbl.setLastModified(1700000100000L))
    assert(Tables.fingerprint(dir.getPath, "documents") != fp1)
  }

  test("fingerprint sees renamed and added part files") {
    val (dir, tbl) = freshTable()
    val fp1 = Tables.fingerprint(dir.getPath, "documents")
    val part = new File(tbl, "part-00000.parquet")
    val renamed = new File(tbl, "part-00001.parquet")
    assert(part.renameTo(renamed))
    assert(renamed.setLastModified(1700000000000L))
    assert(tbl.setLastModified(1700000100000L))
    val fp2 = Tables.fingerprint(dir.getPath, "documents")
    assert(fp2 != fp1)
    val extra = new File(tbl, "part-00002.parquet")
    Files.write(extra.toPath, "cc".getBytes): Unit
    assert(extra.setLastModified(1700000000000L))
    assert(tbl.setLastModified(1700000100000L))
    assert(Tables.fingerprint(dir.getPath, "documents") != fp2)
  }

  test("fingerprint is stable when nothing changes") {
    val (dir, _) = freshTable()
    assert(Tables.fingerprint(dir.getPath, "documents") ==
      Tables.fingerprint(dir.getPath, "documents"))
  }

  /** Schema-drift tripwire: the driver regenerates /root/testdata between
    * rounds and has changed physical types before (events.ts shipped as
    * TIMESTAMP(NANOS), then plain micros/TIMESTAMP_NTZ — r6). Every
    * operator and every DuckDB oracle assumes the surface schema below;
    * when the next drift lands, THIS test names the column instead of 37
    * operator tests failing with coercion errors. Fix drift inside
    * `graft.Tables` (single point), never in operators.
    */
  test("driver testdata matches the canonical surface schema") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val expected = Map(
      "events" -> ("event_id:bigint, ts:timestamp, user_id:bigint, " +
        "event_type:string, value:double, props:string"),
      "documents" -> ("doc_id:bigint, text:string, lang:string, " +
        "source:string, n_chars:bigint"),
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int",
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
        "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
        "l_discount:double, l_tax:double, l_returnflag:string, " +
        "l_linestatus:string, l_shipdate:timestamp_ntz"),
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
        "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"))
    expected.foreach { case (name, want) =>
      val df = if (name == "events") Tables.events(spark, dir)
        else Tables.table(spark, dir, name)
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got == want, s"\ntable $name drifted:\n  got  $got\n  want $want")
    }
  }
}
