package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder tooling (like [[Bench]]/[[Verify]], not part of the shipped
  * library): scale-robustness probe for the slowest query families at an
  * sf1-EQUIVALENT row count, built by replicating the sf0.1 documents table
  * K× in memory. No new test data is synthesized on disk and no oracle is
  * claimed — this measures that the heavy plans (shingle postings joins,
  * connected components, the composed curation pipeline, packing) complete
  * and scale sub-quadratically when the corpus grows 10×, turning the
  * "survives 100× scale-up" posture argument into a measured data point.
  *
  * Replica construction: doc_ids shift by a disjoint range per copy, and
  * every TOKEN gets a per-copy prefix (`c3_the`), so replicas are fully
  * DISSIMILAR from their source — shingle sets share nothing across copies,
  * keeping the near-dup candidate distribution realistic (a naive text-
  * identical replication would turn the whole corpus into K-member dup
  * groups and measure an adversarial stress case instead of scale).
  * Per-copy lang is preserved (lang-blocked joins keep their selectivity);
  * source is preserved (mix cardinality unchanged).
  *
  * Usage: runMain graft.ScaleProbe <sfDir> [replication=10]
  * Prints one JSON line: {"probe":"sf1-equiv","replication":K,
  * "n_docs":N,"queries":{name:sec,...},"total_sec":T,"errors":[...]}.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replication = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-scale-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.setCheckpointDir("target/scale-probe-ckpt")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = (0 until replication).map { i =>
      if (i == 0) base
      else base.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"),
        col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count() // materialize the scaled corpus once, untimed

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators._
    // the slowest families from BENCH_r05, heaviest first is NOT the order —
    // keep the Bench family order so persist lifecycles mirror the gate
    val probes: Seq[(String, () => Unit)] = Seq(
      "dedup_exact" -> (() => noop(Dedup.exact(docs))),
      "dedup_minhash" -> (() => noop(Dedup.minhashSignatures(docs))),
      "lsh_candidates" -> (() => noop(Dedup.lshCandidatePairs(docs))),
      "simhash_pairs" -> (() => noop(Dedup.simhashPairs(docs))),
      "ngram_jaccard" -> (() => noop(Dedup.ngramJaccardPairs(docs, 0.5))),
      "dedup_survivors" -> (() => noop(Dedup.ngramSurvivors(docs, 0.5))),
      "near_dup_clusters" -> (() => noop(Dedup.nearDupClusters(docs, 0.5))),
      "contamination_flags" -> (() => noop(Dedup.benchmarkContamination(docs))),
      "corpus_curate" -> (() => noop(CorpusPipeline.curate(docs))),
      "unigram_logprob" -> (() => noop(TextAnalysis.unigramLogprob(docs))),
      "tok_encode" -> (() => noop(TextAnalysis.encodeTokens(docs, 200))),
      "mix_sample" -> (() => noop(TrainingMix.mixSample(docs, 100000L))),
      "seq_pack" -> (() => noop(TrainingMix.packSequences(docs, 512L))),
      "shard_pack" -> (() => noop(TrainingMix.packShards(docs, 64, 512L))),
      "shuffle_shards" -> (() => noop(TrainingMix.shuffleShards(docs, 64))))

    // vector family at the same replication: identical embeddings under
    // shifted vec_ids (k-means geometry unchanged — duplicated points move
    // no centroid; search cost scales with rows, which is what we measure)
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = (0 until replication).map { i =>
      if (i == 0) embBase
      else embBase.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nVecs = emb.count()
    val q0 = KnnExact.queryVector(emb, 0L)
    val qBatch = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val ivfDir = "target/scale-probe-ivf"
    var ivf: IvfIndex = null
    var ivfWide: IvfIndex = null
    val vectorProbes: Seq[(String, () => Unit)] = Seq(
      "knn_exact" -> (() => noop(KnnExact.topK(emb, q0, 10))),
      "knn_batch" -> (() => noop(KnnBatch.topK(emb, qBatch, 10))),
      "ivf_build" -> (() => { ivf = IvfIndex.build(spark, emb, ivfDir, 16) }),
      "ann_ivf_probe" -> (() => noop(ivf.search(q0, 10, 4))),
      "near_dup_embeddings" -> (() =>
        noop(Dedup.embeddingNearDupPairs(emb, 0.95))),
      // the scale-correct near-dup form: block on IVF cluster with nlist
      // GROWN with the corpus (16·K here, nlist ∝ √N in production) so
      // block size — and with it the per-block pair count — stays bounded
      // as the corpus grows; the label-blocked probe above is the contrast
      // case (fixed block cardinality → quadratic pair growth)
      "ivf_build_wide" -> (() => {
        ivfWide = IvfIndex.build(spark, emb,
          "target/scale-probe-ivf-wide", 16 * replication)
      }),
      "near_dup_ivf" -> (() =>
        noop(Dedup.embeddingNearDupPairsBy(ivfWide.vectors, "cluster", 0.95))))

    var errors = List.empty[String]
    val timings = (probes ++ vectorProbes).map { case (name, run) =>
      val t0 = System.nanoTime()
      val ok = try { run(); true } catch {
        case e: Throwable =>
          System.err.println(s"[scale-probe] $name FAILED: ${e.getMessage}")
          errors ::= name
          false
      }
      // same lifecycle rule as Bench/Verify: release shared subtrees between
      // families so the probe measures each family's own working set
      CacheRegistry.release()
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val total = timings.collect { case (_, v) if v >= 0 => v }.sum
    val qj = timings.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val ej = errors.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"probe":"sf1-equiv","replication":$replication,""" +
      s""""n_docs":$nDocs,"n_vecs":$nVecs,"queries":$qj,""" +
      s""""total_sec":${f"$total%.1f"},"errors":$ej}""")
    spark.stop()
  }
}
