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
    val bytes = dirBytes(new java.io.File(parquetDir))
    val byData = math.ceil(bytes / (128.0 * 1024 * 1024)).toInt
    math.min(4096,
      math.max(spark.sparkContext.defaultParallelism, math.max(4, byData)))
  }

  private def dirBytes(f: java.io.File): Long =
    if (f.isDirectory) f.listFiles().map(dirBytes).sum
    else if (f.isFile) f.length()
    else 0L
}
