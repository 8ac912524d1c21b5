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
}
