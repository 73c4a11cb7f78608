package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY round-20 stage breakdowns for the verdict-r19 target rows:
  * near_dup_frames / frame_dup_share_inc (which banded-Hamming arm costs —
  * the solo×solo agg or the solo×multi semi), near_dup_ivf (candidate
  * enumeration vs per-pair cosine), q14 (histogram agg vs window vs walk).
  * Lives in package graft to reach the harness-shared plumbing; the
  * multimodal/operators internals it needs are private[graft] or public. */
object AbR20 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master("local[32]")
      .appName("ab-r20")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.multimodal.Multimodal

    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[ab-r20] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val which = args.headOption.getOrElse("all")

    if (which == "all" || which == "frames") {
      println("[ab-r20] ===== near_dup_frames =====")
      t("artifact prewarm") {
        graft.sources.FrameSketchLake.sketches(spark, sfDir)
        graft.sources.FrameSketchLake.classes(spark, sfDir)
      }
      (1 to 2).foreach { rep =>
        println(s"[ab-r20] --- frames rep $rep ---")
        val sk = graft.sources.FrameSketchLake.sketches(spark, sfDir)
        val cls = graft.CacheRegistry.persist(
          graft.sources.FrameSketchLake.classes(spark, sfDir))
        t("class cache fill") { noop(cls) }
        val probeN = cls.select(col("lang"), col("ahash"), col("dhash"),
          col("n_docs").as("probe_n_docs"))
        val soloProbes = probeN
          .where(col("probe_n_docs").isNull || col("probe_n_docs") === 1)
          .select(col("lang"), col("ahash"), col("dhash"))
        val bandedSolo = Multimodal.bandClasses(soloProbes, 32)
        val bandKeys = col("a.lang") === col("b.lang") &&
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
        val jointHamming =
          bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))) +
            bit_count(col("a.dhash").bitwiseXOR(col("b.dhash")))
        val soloCorpus = cls.where(col("n_docs") === 1)
        t("soloAgg arm (solo x solo)") {
          noop(bandedSolo.as("a")
            .join(Multimodal.bandClasses(soloCorpus, 32).as("b"), bandKeys)
            .where(jointHamming <= 3)
            .groupBy(col("a.lang").as("lang"), col("a.ahash").as("ahash"),
              col("a.dhash").as("dhash"))
            .agg(min(col("b.solo_doc")).as("solo_min"),
              max(col("b.solo_doc")).as("solo_max")))
        }
        t("multiHits arm (solo x multi semi)") {
          noop(bandedSolo.as("a")
            .join(Multimodal.bandClasses(cls.where(col("n_docs") > 1), 32).as("b"),
              bandKeys && jointHamming <= 3, "left_semi")
            .select(col("a.lang").as("lang"), col("a.ahash").as("ahash"),
              col("a.dhash").as("dhash"))
            .distinct())
        }
        val verd = graft.CacheRegistry.persist(
          Multimodal.classVerdicts(cls, cls, 3, 32))
        t("verdicts fill (both arms+join)") { noop(verd) }
        t("rollup only (verd cached)") {
          noop(Multimodal.shareFromVerdicts(sk, verd))
        }
        t("full timed-row shape") {
          noop(Multimodal.frameDupShareFromSketches(
            graft.sources.FrameSketchLake.sketches(spark, sfDir),
            graft.sources.FrameSketchLake.classes(spark, sfDir))
            .orderBy(col("doc_id")))
        }
        graft.CacheRegistry.release()
      }
    }

    if (which == "all" || which == "ivf") {
      println("[ab-r20] ===== near_dup_ivf =====")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val nClusters = SparkEntry.dedupBlockClusters(spark, sfDir)
      t("ivf prewarm") {
        graft.operators.IvfIndex.forSfDir(spark, sfDir, nClusters)
      }
      (1 to 2).foreach { rep =>
        println(s"[ab-r20] --- ivf rep $rep ---")
        val vecs = graft.operators.IvfIndex.forSfDir(spark, sfDir, nClusters).vectors
        val e = graft.CacheRegistry.persist(
          vecs.select(col("vec_id"), col("cluster").as("blk"), col("embedding")))
        t("vectors cache fill") { noop(e) }
        val joined = e.as("a").join(e.as("b"),
          col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
        t("pair enumeration only (ids)") {
          noop(joined.select(col("a.vec_id"), col("b.vec_id")))
        }
        t("pairs + cosine + filter") {
          noop(joined
            .withColumn("sim", round(graft.functions.GraftFunctions
              .cosineSim(col("a.embedding"), col("b.embedding")), 6))
            .where(col("sim") >= 0.35)
            .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
              col("sim")))
        }
        t("pair count") {
          println(s"[ab-r20]   pairs: ${joined.count()}")
        }
        t("full timed-row shape") {
          noop(graft.operators.Dedup.embeddingNearDupPairsBy(vecs, "cluster", 0.35)
            .orderBy(col("vec_a"), col("vec_b")))
        }
        graft.CacheRegistry.release()
      }
    }

    if (which == "all" || which == "q14") {
      println("[ab-r20] ===== q14_event_percentiles =====")
      (1 to 3).foreach { rep =>
        println(s"[ab-r20] --- q14 rep $rep ---")
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
          .select(col("event_type"), col("value"))
        t("histogram agg only") {
          noop(ev.groupBy(col("event_type"), col("value"))
            .agg(count(lit(1)).as("c")))
        }
        t("full timed-row shape") {
          noop(graft.operators.Relational.eventPercentiles(spark, sfDir)
            .orderBy(col("event_type")))
        }
        graft.CacheRegistry.release()
      }
    }

    spark.stop()
  }
}
