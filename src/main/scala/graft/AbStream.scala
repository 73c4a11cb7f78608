package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Same-JVM A/B for the `band_assign_stream` driver series (verdict r15 #3:
  * 1552 → 1264 → 645 rows/s across r13→r15 is monotone down, and the r15
  * step sits at the repo's 2× rule edge — one bad reading from a formal
  * defect). The stream's CODE is unchanged since before r13
  * ([[graft.operators.Dedup.lshBuckets]] last touched in the native-hash
  * round; [[Bench]]'s streamBench wiring is byte-identical modulo the
  * benchDir plumbing), so the two candidate mechanisms are:
  *
  *   (a) JVM AGING — the streaming arm runs AFTER the batch passes in the
  *       same long-lived session, and the batch suite GREW 111 → 128
  *       queries across exactly those rounds (more listener state, codegen
  *       cache churn, heap shape before the stream starts);
  *   (b) AMBIENCE — the same box-level noise that inflated the r15 cold
  *       pass 296.8 s vs 68.3 warm (all three streams softened together:
  *       frame_sketch 0.72×, serve_ann 0.59×).
  *
  * Protocol: ONE JVM, Bench-identical session configs. Arm FRESH measures
  * the band stream 3× in the pristine JVM; arm AGED first runs the full
  * batch suite once (cache lifecycle included — exactly what precedes the
  * driver's stream rows), then measures the same stream 3×. AGED ≈ FRESH
  * → aging is innocent and the driver series is ambience (re-band); AGED ≪
  * FRESH → mechanism (a) found, fix the harness. Results in BASELINE.md. */
object AbStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master("local[32]")
      .appName("ab-stream")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "20000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val root = s"target/ab-stream/${SfPath.safe(sfDir)}"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    // identical source prep to Bench.streamBench: multi-file docs source so
    // maxFilesPerTrigger=1 yields a genuine micro-batch series
    rm(new java.io.File(root))
    val docSrc = s"$root/docs-src"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
      .repartition(8).write.mode("overwrite").parquet(docSrc)

    var n = 0
    def measureBand(label: String): Unit = {
      n += 1
      val ck = s"$root/ck-$n"; val out = s"$root/out-$n"
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(docSrc)
      val t0 = System.nanoTime()
      val q = graft.streaming.EventStreams.bandAssignStream(src).writeStream
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck).format("parquet")
        .option("path", out).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val rows = prog.map(_.numInputRows).sum.toDouble
      println(f"[ab-stream] $label%-10s rows=$rows%.0f wall=$wall%.2fs " +
        f"rows_per_sec=${rows / wall}%.0f batches=${prog.size}")
    }

    println(s"[ab-stream] arm FRESH (pristine JVM), sf=$sfDir")
    (1 to 3).foreach(i => measureBand(s"fresh$i"))

    println("[ab-stream] aging: one full batch pass (the driver's pre-stream state)")
    val t0 = System.nanoTime()
    SparkEntry.foreachOrdered { (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[ab-stream] $name failed: ${e.getMessage}")
      }
    }
    println(f"[ab-stream] aging pass done in ${(System.nanoTime() - t0) / 1e9}%.1fs")

    println("[ab-stream] arm AGED (post-suite JVM)")
    (1 to 3).foreach(i => measureBand(s"aged$i"))
    spark.stop()
  }
}
