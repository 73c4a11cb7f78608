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
    // per-copy id shift derived from the data, not assumed: a fixed constant
    // would silently collide once base ids reach it (e.g. probing from an
    // sf where doc_ids pass 1e7), corrupting every id-keyed probe
    val docShift = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docs = (0 until replication).map { i =>
      if (i == 0) base
      else base.select(
        (col("doc_id") + lit(i * docShift)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"),
        col("lang"), col("source"))
        // n_chars must describe the MUTATED text (the prefixes add ~4 chars
        // per token); computed after the select so it binds to the new column
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count() // materialize the scaled corpus once, untimed

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators._
    // the slowest families from BENCH_r05. Note the lifecycle is stricter
    // than Bench's: caches are released after EVERY probe (below), so each
    // probe pays its family's full materialization itself — timings are
    // conservative upper bounds vs the gate's family-scoped reuse, which is
    // the right polarity for scale-robustness claims
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

    // vector family at the same replication. Each copy gets a per-copy
    // PERMUTATION of the embedding dimensions: norm-preserving and
    // within-copy geometry-identical (a permutation is a rotation), while
    // cross-copy cosines decorrelate — so the scaled table behaves like
    // K independent shards of "more data", NOT K exact duplicates of every
    // point (which would hand the near-dup probes a synthetic quadratic
    // dup mass and confound the blocking comparison below — the same
    // adversarial-replication trap the text side avoids with token
    // prefixes).
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = embBase.select(size(col("embedding"))).head().getInt(0)
    val vecShift = embBase.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val emb = (0 until replication).map { i =>
      if (i == 0) embBase
      else {
        val perm = array((0 until dim).map(j =>
          element_at(col("embedding"), ((j + 7 * i) % dim) + 1)): _*)
        embBase
          .withColumn("vec_id", col("vec_id") + lit(i * vecShift))
          .withColumn("embedding", perm)
      }
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
      // stop the clock BEFORE the release — unpersist is harness bookkeeping,
      // not query cost
      val elapsed = (System.nanoTime() - t0) / 1e9
      // release after every probe (stricter than Bench's family boundaries —
      // see the note above the probe list)
      CacheRegistry.release()
      name -> (if (ok) elapsed else -1.0)
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
