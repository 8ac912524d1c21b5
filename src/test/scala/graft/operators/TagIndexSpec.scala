package graft.operators

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** TagIndex publication contract: the build lands via atomic rename, so a
  * rebuilt/raced index can never double-append, and temp build dirs never
  * leak next to the published index.
  */
class TagIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  test("ensure builds once, idempotently, with no temp-dir leakage") {
    val path = TagIndex.ensure(spark, dir)
    rmTree(new File(path)) // force a fresh build through the publish path
    val built = TagIndex.ensure(spark, dir)
    assert(built == path)
    val expected = Tables.events(spark, dir).count()
    assert(spark.read.parquet(path).count() == expected)
    // second ensure: no rebuild, no append — row count must not move
    TagIndex.ensure(spark, dir): Unit
    assert(spark.read.parquet(path).count() == expected)
    val siblings = Option(new File(path).getParentFile.listFiles()).get
    assert(siblings.forall(f => !f.getName.contains(".tmp-")),
      s"leaked temp dirs: ${siblings.map(_.getName).mkString(",")}")
  }
}
