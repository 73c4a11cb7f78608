package graft.sources

import org.apache.spark.sql.SparkSession

/** Scale-adaptive bucket-count sizing for the bucketed lake sinks (r19
  * optimization round). The count must come from the DATA, not from a
  * constant tuned to one box: one bucket per ~128 MB of on-disk artifact
  * (the guide §6 input-split sweet spot), floored at the session's default
  * parallelism (a bucketed scan schedules one task per bucket, so fewer
  * buckets than cores would starve the scan — this floor tracks whatever
  * core count the driver runs the bench at), capped at 4096 (past that the
  * small-files tax outweighs the parallelism). */
private[graft] object LakeBuckets {

  def forDir(spark: SparkSession, parquetDir: String): Int = {
    val bytes = dirBytes(spark, parquetDir)
    val byData = math.ceil(bytes / (128.0 * 1024 * 1024)).toInt
    math.min(4096,
      math.max(spark.sparkContext.defaultParallelism, math.max(4, byData)))
  }

  /** Artifact size via the Hadoop FileSystem API (ADVICE r19): java.io.File
    * silently read a missing or non-local (URI-scheme) path as 0 bytes —
    * handing every such artifact the parallelism-floor bucket count instead
    * of failing — and File.listFiles() returns null on IO error. Hadoop
    * resolves any scheme the session can read and getContentSummary throws
    * FileNotFoundException on a missing dir, which is the loud failure a
    * mis-plumbed artifact path deserves. */
  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"LakeBuckets: artifact dir does not exist: $dir — bucket sizing " +
        "must see the materialized artifact, not default silently")
    fs.getContentSummary(p).getLength
  }
}
