package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY stage breakdown for the near_dup_frames sf10 row (verdict r15
  * #6): where do the ~12 s go — sketch fill, class quotient, verdict join,
  * or rollup? Uses the CacheRegistry plan-match dedupe: pre-persisting the
  * same sketch/class plans makes the full query's third timing read ONLY
  * the verdict join + rollup. */
object AbFrameDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master("local[32]")
      .appName("ab-framedup")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.multimodal.Multimodal

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[ab-framedup] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { rep =>
      println(s"[ab-framedup] --- rep $rep ---")
      t("sketch scan (no persist)") {
        noop(Multimodal.phashFrames(docs, carry = Seq("lang")))
      }
      val sk = graft.CacheRegistry.persist(
        Multimodal.phashFrames(docs, carry = Seq("lang")))
      t("sketch persist fill") { noop(sk) }
      val cls = graft.CacheRegistry.persist(Multimodal.sketchClasses(sk))
      t("class quotient fill") { noop(cls) }
      t("full frameDupShare (cached)") { noop(Multimodal.frameDupShare(docs)) }
      t("full frameDupShare again") { noop(Multimodal.frameDupShare(docs)) }
      t("classVerdicts only") {
        noop(Multimodal.classVerdicts(cls, cls, 3, 32))
      }
      val verd = graft.CacheRegistry.persist(
        Multimodal.classVerdicts(cls, cls, 3, 32))
      t("verdicts persist fill") { noop(verd) }
      t("rollup only (verd cached)") {
        noop(Multimodal.shareFromVerdicts(sk, verd))
      }
      t("solo join output count") {
        val soloProbes = cls.where(col("n_docs") === 1)
          .select(col("lang"), col("ahash"), col("dhash"))
        val j = Multimodal.bandClasses(soloProbes, 32).as("a")
          .join(Multimodal.bandClasses(cls, 32).as("b"),
            col("a.lang") === col("b.lang") &&
              col("a.band") === col("b.band") && col("a.bv") === col("b.bv"))
        println(s"    candidate rows: ${j.count()}")
      }
      graft.CacheRegistry.release()
      println(s"[ab-framedup] released")
    }
    spark.stop()
  }
}
