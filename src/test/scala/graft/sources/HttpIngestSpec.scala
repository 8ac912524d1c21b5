package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** B2 transport: real HTTP round-trip into the spool, with the reference's
  * status semantics (ref: forward_server.go:30-79), and the spool parsing
  * end-to-end through the Wire surface.
  */
class HttpIngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val batch =
    """{"m":[{"t":"2024-01-01T00:09:58.778549Z","m":"gauge","h":"web-1","n":"load.1","v":0.42,"g":{"env":"prod"}}],
      | "l":[],"e":[]}""".stripMargin.replace("\n", "")

  test("submit-batch: auth/status semantics and atomic spool publish") {
    val spool = Files.createTempDirectory("graft_spool").toString
    val srv = HttpIngest.start(spool, keys = Map("web-1" -> "s3cret"))
    try {
      val url = s"http://127.0.0.1:${srv.port}/v1/submit-batch"
      assert(HttpIngest.post(url, batch, Some("web-1:s3cret")) == 204)
      assert(HttpIngest.post(url, batch, Some("web-1:wrong")) == 401)
      assert(HttpIngest.post(url, batch, None) == 401)
      assert(HttpIngest.post(url, "not json", Some("web-1:s3cret")) == 400)
      // strict whole-body decode: trailing garbage and non-object roots
      // are rejects, like the reference's struct decode
      assert(HttpIngest.post(url, batch + " trailing", Some("web-1:s3cret")) == 400)
      assert(HttpIngest.post(url, "123", Some("web-1:s3cret")) == 400)
      // only the accepted batch landed, atomically (no .part files)
      val files = new java.io.File(spool).listFiles.map(_.getName)
      assert(files.length == 1 && files.head.startsWith("batch-"), files.toSeq)
    } finally srv.stop()
  }

  test("spooled envelopes parse through the Wire surface end-to-end") {
    val spool = Files.createTempDirectory("graft_spool2").toString
    val srv = HttpIngest.start(spool) // keyless server accepts all
    try {
      val url = s"http://127.0.0.1:${srv.port}/v1/submit-batch"
      assert(HttpIngest.post(url, batch) == 204)
      assert(HttpIngest.post(url, batch) == 204)
      val m = Wire.metrics(spark.read.text(spool)).collect()
      assert(m.length == 2)
      assert(m.forall(_.getAs[String]("name") == "load.1"))
      assert(m.forall(_.getAs[Map[String, String]]("tags") == Map("env" -> "prod")))
    } finally srv.stop()
  }
}
