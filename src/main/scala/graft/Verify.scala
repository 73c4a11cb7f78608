package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (builder iteration
    // on one query without the full 100-query dump); absent = run everything.
    // Names are trimmed and MUST each match a declared query — a typo'd
    // filter would otherwise dump nothing for that name and the comparator
    // would vacuously PASS on what remains (review r11)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in filter: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // joins planned like the bench (guide §3.1 — correctness must be
      // verified under the same join strategies timing runs with)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // same status-store cap as Bench: a 90-query dump run accumulates
      // listener plan graphs the harness never reads
      .config("spark.sql.ui.retainedExecutions", "16")
      // same generated-class cache sizing as Bench (r10): a 112-query run
      // generates ~1,300+ distinct codegen classes; the 100-entry default
      // recompiles them continuously
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    // family order via the SHARED cache-lifecycle loop (one definition with
    // Bench — round-5 review: two hand-maintained copies of the boundary
    // rule would let timings drift from the discipline correctness ran under)
    SparkEntry.foreachOrdered { (name, fn) =>
      if (!only.forall(_.contains(name))) ()
      // plain parallel write — the comparator reads the whole directory and
      // sorts rows itself, so funneling each result through one task via
      // coalesce(1) bought nothing and serialized the dump at sf1+ (r5 item 6)
      else try fn(spark, sfDir).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must leave NO parquet behind: stale output from a
        // previous run would let the DuckDB compare silently validate old
        // results and mask the regression (r5 review)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete(); ()
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // keyed render (verdict r10 #2): export paths are pure functions of
    // (sfDir, config) and the tuned probe resolves itself, so the dump is
    // correct regardless of which queries ran above. A FILTERED builder run
    // dumps only its filtered oracles (review r11): the comparator then
    // checks exactly what was produced, and rendering skips the tuner's
    // index build when ivf_tuned_probe wasn't selected.
    val json = SparkEntry.oracleSqlFor(spark, sfDir, only)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
