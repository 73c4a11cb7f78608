package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY stage breakdown for the frame_dup_share_inc sf10 row (verdict
  * r16 #2): where do the ~8.3 s go — batch sketch fill, the batch class
  * quotient, the disjoint-class merge groupBy, the solo/multi verdict
  * joins, or the rollup? Same protocol as [[AbFrameDup]]. */
object AbFrameDupInc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master("local[32]")
      .appName("ab-framedupinc")
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
      println(f"[ab-fdsinc] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    t("artifact prewarm") {
      graft.sources.IncrementalHistory.phashSketches(spark, sfDir)
      graft.sources.IncrementalHistory.phashClasses(spark, sfDir)
      graft.CacheRegistry.release()
    }
    val batch = graft.sources.IncrementalHistory.batchDocs(docs)
    val histSk = graft.sources.IncrementalHistory.phashSketches(spark, sfDir)
    val histCls = graft.sources.IncrementalHistory.phashClasses(spark, sfDir)

    (1 to 3).foreach { rep =>
      println(s"[ab-fdsinc] --- rep $rep ---")
      t("FULL incremental (cold)") {
        noop(Multimodal.frameDupShareIncremental(batch, histSk,
          disjointHistoryClasses = Some(histCls)))
      }
      t("FULL incremental (warm)") {
        noop(Multimodal.frameDupShareIncremental(batch, histSk,
          disjointHistoryClasses = Some(histCls)))
      }
      graft.CacheRegistry.release()
      if (rep == 1) {
        val newSk = graft.CacheRegistry.persist(
          Multimodal.phashFrames(batch, carry = Seq("lang")))
        t("batch sketch fill") { noop(newSk) }
        val probeClasses = graft.CacheRegistry.persist(
          Multimodal.sketchClasses(newSk))
        t("batch class quotient fill") { noop(probeClasses) }
        val corpusClasses = probeClasses.unionByName(histCls)
          .groupBy(col("lang"), col("ahash"), col("dhash"))
          .agg(sum(col("n_docs")).as("n_docs"),
            min(col("solo_doc")).as("solo_doc"))
        t("disjoint class merge") { noop(corpusClasses) }
        val corpusCached = graft.CacheRegistry.persist(corpusClasses)
        t("corpus classes persist fill") { noop(corpusCached) }
        t("classVerdicts (corpus cached)") {
          noop(Multimodal.classVerdicts(probeClasses, corpusCached, 3, 32))
        }
        // arm-level split of classVerdicts
        val probeN = probeClasses.select(col("lang"), col("ahash"), col("dhash"))
          .join(corpusCached.select(col("lang"), col("ahash"), col("dhash"),
              col("n_docs").as("probe_n_docs")),
            Seq("lang", "ahash", "dhash"), "left")
        val probeNCached = graft.CacheRegistry.persist(probeN)
        t("arm: probeN lookup join") { noop(probeNCached) }
        val soloProbes = probeNCached
          .where(col("probe_n_docs").isNull || col("probe_n_docs") === 1)
          .select(col("lang"), col("ahash"), col("dhash"))
        val bandedSolo = Multimodal.bandClasses(soloProbes, 32)
        val bandKeys = col("a.lang") === col("b.lang") &&
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
        val ham = (bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))) +
          bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))))
        t("arm: solo x solo agg") {
          noop(bandedSolo.as("a")
            .join(Multimodal.bandClasses(
              corpusCached.where(col("n_docs") === 1), 32).as("b"), bandKeys)
            .where(ham <= 3)
            .groupBy(col("a.lang"), col("a.ahash"), col("a.dhash"))
            .agg(min(col("b.solo_doc")).as("solo_min"),
              max(col("b.solo_doc")).as("solo_max")))
        }
        t("arm: solo x multi semi") {
          noop(bandedSolo.as("a")
            .join(Multimodal.bandClasses(
                corpusCached.where(col("n_docs") > 1), 32).as("b"),
              bandKeys && ham <= 3, "left_semi")
            .select(col("a.lang"), col("a.ahash"), col("a.dhash"))
            .distinct())
        }
        println(s"    probe classes: ${probeClasses.count()}, " +
          s"solo probes: ${soloProbes.count()}, corpus: ${corpusCached.count()}")
        t("arm: solo x solo agg (sh hint)") {
          noop(bandedSolo.hint("shuffle_hash").as("a")
            .join(Multimodal.bandClasses(
              corpusCached.where(col("n_docs") === 1), 32).as("b"), bandKeys)
            .where(ham <= 3)
            .groupBy(col("a.lang"), col("a.ahash"), col("a.dhash"))
            .agg(min(col("b.solo_doc")).as("solo_min"),
              max(col("b.solo_doc")).as("solo_max")))
        }
        t("arm: solo x multi semi (sh hint)") {
          noop(bandedSolo.as("a")
            .join(Multimodal.bandClasses(
                corpusCached.where(col("n_docs") > 1), 32)
                .hint("shuffle_hash").as("b"),
              bandKeys && ham <= 3, "left_semi")
            .select(col("a.lang"), col("a.ahash"), col("a.dhash"))
            .distinct())
        }
        t("arm: solo x solo agg (bc probe)") {
          noop(broadcast(bandedSolo).as("a")
            .join(Multimodal.bandClasses(
              corpusCached.where(col("n_docs") === 1), 32).as("b"), bandKeys)
            .where(ham <= 3)
            .groupBy(col("a.lang"), col("a.ahash"), col("a.dhash"))
            .agg(min(col("b.solo_doc")).as("solo_min"),
              max(col("b.solo_doc")).as("solo_max")))
        }
        t("arm: solo x multi semi (bc probe)") {
          // left_semi keeps the PROBE side, so broadcasting the probe means
          // the corpus multi side must stream as the LEFT... invert: right
          // side of a semi must be the lookup. Use inner+distinct instead.
          noop(broadcast(bandedSolo).as("a")
            .join(Multimodal.bandClasses(
                corpusCached.where(col("n_docs") > 1), 32).as("b"),
              bandKeys && ham <= 3)
            .select(col("a.lang"), col("a.ahash"), col("a.dhash"))
            .distinct())
        }
        val verd = graft.CacheRegistry.persist(
          Multimodal.classVerdicts(probeClasses, corpusCached, 3, 32))
        t("verdicts persist fill") { noop(verd) }
        t("rollup only (verd cached)") {
          noop(Multimodal.shareFromVerdicts(newSk, verd))
        }
        graft.CacheRegistry.release()
        println(s"[ab-fdsinc] released")
      }
    }
    spark.stop()
  }
}
