package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (sbt forks a single
  * test JVM; building a session per suite would dominate runtime).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the default FileContext checkpoint manager shells out (readlink via
      // hadoop Shell) on every metadata-log rename; those subprocesses hang
      // in this sandboxed test env — the FileSystem-based manager stays
      // in-process
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
