package graft

import org.apache.spark.sql.SparkSession

/** THROWAWAY: time ONE SparkEntry query in a Bench-identical session, to
  * localize the AbJaccard(12 s)-vs-Bench(58 s) gap at sf10. Toggles via
  * args: "noext" drops the extensions, "release" calls CacheRegistry
  * release between reps (the Bench pass-boundary behavior). */
object AbBenchCtx {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val qname = sys.env.getOrElse("Q", "ngram_jaccard")
    val b = SparkSession.builder().master("local[32]")
      .appName("ab-benchctx")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
    val spark =
      (if (args.contains("noext")) b
       else b.config("spark.sql.extensions", "graft.plans.GraftSparkExtensions"))
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = qname.split(",").toSeq
    (1 to 3).foreach { i =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"  rep$i $n%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
          s"(tracked caches: ${CacheRegistry.trackedCount})")
      }
      if (args.contains("release")) { CacheRegistry.release(); println("  -- release --") }
    }
    spark.stop()
  }
}
