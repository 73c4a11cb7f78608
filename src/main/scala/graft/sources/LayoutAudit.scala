package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scan-layout audit — the r13 lake-shape lesson as a first-class tool.
  *
  * A 100 TB engine is only as parallel as its file layout lets it be: Spark
  * assigns scan splits by `maxSplitBytes = min(maxPartitionBytes,
  * max(openCostInBytes, totalBytes / defaultParallelism))`, but a split can
  * only START a parquet row group — so a big table written as one file with
  * one row group is ONE scan task no matter how many cores the cluster has,
  * and every downstream narrow stage (filter/project/sketch) single-threads
  * behind it. Measured on this suite: the identical 124-query bench at sf1
  * ran 588.6 s over single-file tables vs 94.9 s over 40-part-file tables —
  * a 6.2× swing from layout alone, with zero code difference.
  *
  * [[audit]] reports, per table: file count, bytes, row groups, the
  * effective scan-task bound (split math capped by row-group count), and a
  * starvation flag with a concrete rewrite suggestion. Footer reads are
  * distributed (one Spark job over the file list), so the driver only ever
  * holds per-table aggregates — the shape that survives a million-file lake.
  * Listing is driver-side via the filesystem, same as Spark's own
  * InMemoryFileIndex.
  */
object LayoutAudit {

  /** One table's layout facts. `estScanTasks` is the effective parallelism
    * bound for a full scan under the CURRENT session conf: Spark's split
    * count capped by the number of row groups (a split with no row-group
    * start is an empty task). */
  final case class TableLayout(
      table: String,
      files: Long,
      bytes: Long,
      rowGroups: Long,
      estScanTasks: Long,
      cores: Int,
      starved: Boolean,
      advice: String)

  /** The sfDir table set ([[graft.SparkEntry]] contract). */
  val DefaultTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Target bytes per part file when suggesting a rewrite: big enough to
    * amortize open cost and keep footers sane, small enough that a table
    * fans out across the cluster (32 MB ≈ a quarter of the default
    * 128 MB maxPartitionBytes, so packing still coalesces). */
  val TargetBytesPerFile: Long = 32L << 20

  /** Suggested part-file count for a rewrite: enough files to feed every
    * core, but never smaller than [[TargetBytesPerFile]] slices. The small-
    * file floor is 512 KB — it must stay at or below `minBytes / (cores/2)`
    * (8 MB / 16), or the suggestion can't satisfy the audit's own
    * `est >= cores/2` threshold for tables in the 8–32 MB band: the r15
    * relayout mirror rewrote a 10.8 MB table to 11 × 1 MB files and the
    * re-audit correctly kept flagging it starved (11 < 16 scan tasks). */
  def suggestedFiles(bytes: Long, cores: Int): Int = {
    val bySize = math.ceil(bytes.toDouble / TargetBytesPerFile).toInt
    math.max(math.min(cores, math.max(1, math.ceil(bytes.toDouble / (512L << 10)).toInt)), bySize)
  }

  /** Audit every table under `root` (each either a single `name.parquet`
    * file or a `name.parquet/` part-file directory). `minBytes` gates the
    * starvation flag — tiny dims are SUPPOSED to be one file, and flagging
    * them would train users to ignore the report. */
  def audit(spark: SparkSession, root: String,
      tables: Seq[String] = DefaultTables,
      minBytes: Long = 8L << 20): DataFrame = {
    import spark.implicits._
    val rows = tables.map(t => auditTable(spark, s"$root/$t.parquet", t, minBytes))
    spark.createDataset(rows).toDF()
  }

  /** Audit one table path. Footer reads run as a distributed job over the
    * file list; only (files, bytes, rowGroups) partial sums come back. */
  def auditTable(spark: SparkSession, path: String, table: String,
      minBytes: Long = 8L << 20): TableLayout = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listDataFiles(fs, hPath)
    val sizes = files.map(f => (f.getPath.toString, f.getLen))
    val totalBytes = sizes.map(_._2).sum

    val rowGroups =
      if (sizes.isEmpty) 0L
      else spark.sparkContext
        .parallelize(sizes.map(_._1), math.min(sizes.size, 32).max(1))
        .mapPartitions { paths =>
          // Fresh local conf on the executor: footers live next to the data,
          // and the audit targets filesystems the default conf can open.
          val conf = new org.apache.hadoop.conf.Configuration()
          paths.map { p =>
            val in = HadoopInputFile.fromPath(new Path(p), conf)
            val r = ParquetFileReader.open(in)
            try r.getFooter.getBlocks.size.toLong finally r.close()
          }
        }
        .fold(0L)(_ + _)

    val conf = spark.sessionState.conf
    val cores = spark.sparkContext.defaultParallelism
    val openCost = conf.filesOpenCostInBytes
    val bytesPerCore = (totalBytes + sizes.size * openCost) / math.max(1, cores)
    val maxSplitBytes =
      math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore))
    val splits = sizes.map { case (_, len) =>
      math.max(1L, math.ceil(len.toDouble / maxSplitBytes).toLong)
    }.sum
    val est = math.min(splits, math.max(rowGroups, if (sizes.isEmpty) 0L else 1L))

    val starved = totalBytes >= minBytes && est < math.max(1, cores / 2)
    val advice =
      if (sizes.isEmpty) "missing table"
      else if (starved)
        s"scan-task starved: rewrite as ~${suggestedFiles(totalBytes, cores)} part files"
      else "ok"
    TableLayout(table, sizes.size.toLong, totalBytes, rowGroups, est, cores, starved, advice)
  }

  /** Data files under a table path: the path itself when it is a plain
    * file, else non-hidden `*.parquet` children (Spark's success markers
    * and checksums excluded). */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem, p: Path) = {
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(fs.getFileStatus(p))
    else fs.listStatus(p).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
  }
}
