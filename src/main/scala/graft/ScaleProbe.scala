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
  * Usage: runMain graft.ScaleProbe <sfDir> [replication=10] [probe1,probe2,...]
  * (the optional third arg filters to named probes — single-family runs at
  * big replications without paying the whole sweep; probes whose inputs the
  * filter skips, e.g. near_dup_ivf without ivf_build_wide, are the caller's
  * responsibility to co-select). Prints one JSON line:
  * {"probe":"sf1-equiv","replication":K,
  * "n_docs":N,"queries":{name:sec,...},"total_sec":T,"errors":[...]}.
  */
object ScaleProbe {

  /** 100-language marker table for the lang-id cost-model probe pair — the
    * SAME deterministic generator as PropertySpec's parity property (4 own
    * markers per language, every 7th language re-claims a neighbor's first
    * marker, mirroring the real de/zh and es/fr marker collisions). */
  val BigMarkers: Seq[(String, Seq[String])] = (0 until 100).map { i =>
    val own = (0 until 4).map(j => s"m${i}_$j")
    val shared = if (i % 7 == 0 && i > 0) Seq(s"m${i - 1}_0") else Seq.empty
    f"l$i%03d" -> (own ++ shared)
  }

  /** Per-copy dimension-PERMUTED replication of an embeddings table:
    * norm-preserving and within-copy geometry-identical (a permutation is a
    * rotation), cross-copy cosines decorrelated — the scaled table behaves
    * like K independent shards of "more data", NOT K exact duplicates (see
    * the vector-probe note in [[main]]). The shift step is odd and coprime
    * to dim so no copy ever gets the identity permutation. */
  private def replicateEmb(embBase: DataFrame, replication: Int): DataFrame = {
    val dim = embBase.select(size(col("embedding"))).head().getInt(0)
    val vecShift = embBase.agg(max(col("vec_id"))).head().getLong(0) + 1L
    def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
    val shiftStep = (3 until dim).find(s => s % 2 == 1 && gcd(s, dim) == 1)
      .getOrElse(1)
    require(replication <= dim,
      s"replication $replication exceeds dim $dim: some copies would repeat a shift")
    (0 until replication).map { i =>
      if (i == 0) embBase
      else {
        val perm = array((0 until dim).map(j =>
          element_at(col("embedding"), ((j + shiftStep * i) % dim) + 1)): _*)
        embBase
          .withColumn("vec_id", col("vec_id") + lit(i * vecShift))
          .withColumn("embedding", perm)
      }
    }.reduce(_ unionByName _)
  }

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

    // optional probe-name filter (args(2)): families whose probes are all
    // filtered out skip their corpus materialization entirely
    val rawFilter = args.lift(2).map(_.split(",").map(_.trim).toSet)
    // Selecting a TIMED skew probe implies its untimed setup row: the skew
    // materialization is a lazy val forced by whichever skew probe runs
    // first, so a filter naming only plain/salted would fold the replicated
    // persist + hot-key report into the first timed body and corrupt the
    // plain-vs-salted comparison (advice r12).
    val probeFilter = rawFilter.map { f =>
      if ((f.contains("skewjoin_plain") || f.contains("skewjoin_salted")) &&
          !f.contains("skewjoin_setup")) {
        System.err.println("[scale-probe] implicitly including skewjoin_setup" +
          " so plain/salted never absorb the materialization cost")
        f + "skewjoin_setup"
      } else f
    }
    def wants(names: String*): Boolean =
      probeFilter.forall(f => names.exists(f.contains))

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

    val spanArtDir =
      s"target/scale-probe-spanart-${SfPath.safe(sfDir)}-x$replication"

    import graft.operators._
    // the slowest families from BENCH_r05. Note the lifecycle is stricter
    // than Bench's: caches are released after EVERY probe (below), so each
    // probe pays its family's full materialization itself — timings are
    // conservative upper bounds vs the gate's family-scoped reuse, which is
    // the right polarity for scale-robustness claims
    val probes: Seq[(String, () => Unit)] = Seq(
      "dedup_exact" -> (() => noop(Dedup.exact(docs))),
      // incremental (daily-ingest) dedup, plain anti-join vs bloom-prefiltered:
      // both probes pay the identical history hash-table build (seen is
      // recomputed inside each, and caches release between probes), so the
      // pairwise delta isolates the anti-join strategy — the claim under test
      // is that the bloom form's advantage GROWS with history size, since the
      // big side shrinks to ~dups + fpp·|history| before its exchange
      "incdedup_plain" -> (() => {
        val seen = Dedup.exact(docs.where(col("doc_id") % 5 =!= 4))
          .select(col("text_md5"))
        noop(Dedup.incrementalExact(docs.where(col("doc_id") % 5 === 4), seen))
      }),
      "incdedup_bloom" -> (() => {
        val seen = Dedup.exact(docs.where(col("doc_id") % 5 =!= 4))
          .select(col("text_md5"))
        noop(Dedup.incrementalExactBloom(docs.where(col("doc_id") % 5 === 4),
          seen, expectedItems = 1L << 20, numBits = 1L << 23))
      }),
      // not a timing probe: measures the STRUCTURAL effect local wall-clock
      // can't show (local shuffles are too cheap for the IO regime where the
      // bloom wins) — how many history rows survive the pushed probe and
      // therefore enter the anti-join exchange. The rate ≈ dups + fpp and is
      // scale-invariant in |history|; at cluster scale it IS the shuffle-byte
      // reduction.
      "incdedup_bloom_prune_rate" -> (() => {
        import graft.functions.GraftFunctions.{bloomSketch, bloomMightContain, contentHash}
        val seen = Dedup.exact(docs.where(col("doc_id") % 5 =!= 4))
          .select(col("text_md5")).persist()
        val batch = docs.where(col("doc_id") % 5 === 4)
          .select(contentHash(col("text")).as("text_md5"))
        val sk = bloomSketch(batch, col("text_md5"), 1L << 20, 1L << 23)
        val total = seen.count()
        val pruned = seen.where(bloomMightContain(sk, col("text_md5"))).count()
        seen.unpersist()
        System.err.println(f"[scale-probe] bloom prune: seen=$total%d " +
          f"pruned=$pruned%d rate=${pruned.toDouble / total}%.6f")
      }),
      "dedup_minhash" -> (() => noop(Dedup.minhashSignatures(docs))),
      "lsh_candidates" -> (() => noop(Dedup.lshCandidatePairs(docs))),
      "simhash_pairs" -> (() => noop(Dedup.simhashPairs(docs))),
      "ngram_jaccard" -> (() => noop(Dedup.ngramJaccardPairs(docs, 0.5))),
      "dedup_survivors" -> (() => noop(Dedup.ngramSurvivors(docs, 0.5))),
      "near_dup_clusters" -> (() => noop(Dedup.nearDupClusters(docs, 0.5))),
      "contamination_flags" -> (() => noop(Dedup.benchmarkContamination(docs))),
      "corpus_curate" -> (() => noop(CorpusPipeline.curate(docs))),
      "unigram_logprob" -> (() => noop(TextAnalysis.unigramLogprob(docs))),
      // not a timing probe so much as a scale-gated invariant: bigramLogprob
      // keys its count tables on 60-bit hashes, and this asserts injectivity
      // over the scaled corpus' actual bigram/token sets (collision would
      // silently merge two bigrams' counts — the documented caveat at
      // TextAnalysis.bigramLogprob, here enforced where scale grows)
      "bigram_hash_audit" -> (() => {
        val r = TextAnalysis.bigramHashAudit(docs).head()
        require(r.getLong(0) == r.getLong(1) && r.getLong(2) == r.getLong(3) &&
          r.getLong(4) == r.getLong(5), // full-token set = unigram key set
          s"60-bit hash collision at probe scale: $r")
      }),
      // same invariant for the hash-native shingle/span postings (verdict
      // r11 #5): distinct window STRINGS == distinct h60s over the scaled
      // corpus' actual 3-shingle and 20-token-window sets — the declared
      // "collision-free in practice" contract as a measured fact where
      // scale grows (a collision silently merges two posting lists)
      "span_hash_audit" -> (() => {
        Dedup.spanHashAudit(docs).collect().foreach { r =>
          require(r.getLong(1) == r.getLong(2),
            s"60-bit hash collision at probe scale: $r")
        }
      }),
      // sequential vs batched BPE trainer at the SAME rule budget (K=8): the
      // batched form selects top-M pairwise-disjoint merges per round and
      // pays ONE chained-fold symbol rewrite for all M, so its full-corpus
      // rewrite count drops ~M× — this probe pair turns that claim into a
      // measured number at scale (verdict r8 #6; batched is the production
      // trainer, sequential the reference semantics it parity-tests against)
      "bpe_seq_k8" -> (() => noop(Bpe.trainMerges(spark, docs, 8))),
      "bpe_batched_m8" -> (() =>
        noop(Bpe.trainMergesBatched(spark, docs, 8, batchSize = 8))),
      // span-level dedup family: the window table is one row per token
      // position, so both probes must scale ∝ corpus tokens (linear), and
      // the scrub's rewrite cost stays confined to affected docs
      "dup_span_share" -> (() => noop(Dedup.dupSpanShare(docs))),
      "scrub_dup_spans" -> (() => noop(Dedup.scrubDupSpans(docs))),
      // the r18 SERVING forms (what SparkEntry ships): duplication
      // discovery reads the span-lake artifacts — the refresh build lands
      // once ("span_lake_build": full-corpus window set, the ingest-sink
      // shape, + its ≥2-distinct-docs view), then the serving rows pay
      // affected-only position recovery. The plain-vs-prebuilt delta at
      // each replication is the measured value of the artifact split, and
      // the prebuilt probes' growth is the serving-cost growth law.
      // Keyed dirs like span_art_build; missing artifact fails loudly.
      "span_lake_build" -> (() => {
        Dedup.spanWindowSet(docs)
          .write.mode("overwrite").parquet(s"$spanArtDir-lakewin")
        spark.read.parquet(s"$spanArtDir-lakewin")
          .groupBy(col("wh")).agg(count(lit(1)).as("nd"))
          .where(col("nd") > 1).select(col("wh"))
          .write.mode("overwrite").parquet(s"$spanArtDir-lakedup")
      }),
      "dup_span_share_prebuilt" -> (() => noop(Dedup.dupSpanSharePrebuilt(
        docs, spark.read.parquet(s"$spanArtDir-lakewin"),
        spark.read.parquet(s"$spanArtDir-lakedup")))),
      "scrub_dup_spans_prebuilt" -> (() => noop(Dedup.scrubDupSpansPrebuilt(
        docs, spark.read.parquet(s"$spanArtDir-lakewin"),
        spark.read.parquet(s"$spanArtDir-lakedup")))),
      // incremental span ingest, split the way production pays it: the
      // 9/10-history window artifact lands once ("span_art_build" — the
      // per-refresh cost, ∝ history tokens), then the daily batch probes
      // the PERSISTED artifact ("dup_span_share_inc" — the per-day cost,
      // batch-only tokenize). The inc-vs-full delta against dup_span_share
      // is the O(batch) ingest claim, measured. Artifact path keyed by
      // (sfDir, replication) — a fixed path would let a filtered run
      // silently probe a STALE artifact from a different corpus size and
      // report a timing for the wrong history (review r11); a missing
      // keyed artifact fails loudly instead, like near_dup_ivf without
      // ivf_build_wide.
      "span_art_build" -> (() =>
        Dedup.spanWindowSet(docs.where(col("doc_id") % 10 =!= 9))
          .write.mode("overwrite").parquet(spanArtDir)),
      "dup_span_share_inc" -> (() => noop(Dedup.dupSpanShareIncremental(
        docs.where(col("doc_id") % 10 === 9),
        spark.read.parquet(spanArtDir)))),
      // clustering family's incremental pair (r13, sixth modality; sets
      // artifact since r15): the per-refresh artifact build (sets + labels
      // — labels pay a full CC over history, the once-per-bootstrap cost),
      // then the daily probe whose cost must stay ∝ batch tokens +
      // prefix-candidate work + star edges — the inc-vs-full delta
      // against near_dup_clusters is the O(batch) claim, measured
      "clust_art_build" -> (() => {
        val hist = docs.where(col("doc_id") % 10 =!= 9)
        val sets = Dedup.shingleSetsOf(hist)
        sets.write.mode("overwrite").parquet(s"$spanArtDir-clustsets")
        Dedup.nearDupClusters(hist, 0.5)
          .write.mode("overwrite").parquet(s"$spanArtDir-clustlabel")
        // the r17 prebuilt-arm refresh artifacts (order sketch + history
        // prefix postings), built here so the _prebuilt probe below times
        // ONLY the daily probe — mirroring IncrementalHistory's split
        val cms = Dedup.shingleOrderCms(sets)
        // tmp + ATOMIC_MOVE, mirroring IncrementalHistory.shingleCms: a torn
        // cms would make the probe prefix the batch under a DIFFERENT order
        // than the stored history prefixes — prefix-filter soundness breaks
        // silently (dropped pairs), it does not error (ADVICE r17)
        val cmsPath = java.nio.file.Paths.get(s"$spanArtDir-clustcms")
        val cmsTmp = cmsPath.resolveSibling(cmsPath.getFileName.toString + ".tmp")
        java.nio.file.Files.write(cmsTmp, cms)
        java.nio.file.Files.move(cmsTmp, cmsPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Dedup.shinglePrefixesUnder(sets, cms, 0.5)
          .write.mode("overwrite").parquet(s"$spanArtDir-clustprefix")
      }),
      "near_dup_clusters_inc" -> (() => noop(Dedup.nearDupClustersIncremental(
        docs.where(col("doc_id") % 10 === 9),
        spark.read.parquet(s"$spanArtDir-clustsets"),
        spark.read.parquet(s"$spanArtDir-clustlabel"), 0.5))),
      // the SERVING form (what SparkEntry ships since r17): same daily
      // batch, history prefixes + order sketch read from the prebuilt
      // artifacts — the inc-vs-prebuilt delta at each replication is the
      // measured value of moving the prefix build to refresh time
      "near_dup_clusters_inc_prebuilt" -> (() =>
        noop(Dedup.nearDupClustersIncrementalPrebuilt(
          docs.where(col("doc_id") % 10 === 9),
          spark.read.parquet(s"$spanArtDir-clustsets"),
          spark.read.parquet(s"$spanArtDir-clustprefix"),
          java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"$spanArtDir-clustcms")),
          spark.read.parquet(s"$spanArtDir-clustlabel"), 0.5))),
      // media dedup family: the sketch stage must scale ∝ corpus payload
      // bytes (one codegen pass per row, zero shuffle) and the share
      // rollup's OUTPUT stays O(docs) even though its banded candidate
      // join grows with the corpus's perceptual-collision rate — the
      // design reason the serving signal is a share, not a pair list
      "phash_sketch" -> (() =>
        noop(graft.multimodal.Multimodal.phashFrames(docs, carry = Seq("lang")))),
      "frame_dup_share" -> (() =>
        noop(graft.multimodal.Multimodal.frameDupShare(docs))),
      "tok_encode" -> (() => noop(TextAnalysis.encodeTokens(docs, 200))),
      "mix_sample" -> (() => noop(TrainingMix.mixSample(docs, 100000L))),
      "seq_pack" -> (() => noop(TrainingMix.packSequences(docs, 512L))),
      "shard_pack" -> (() => noop(TrainingMix.packShards(docs, 64, 512L))),
      "shuffle_shards" -> (() => noop(TrainingMix.shuffleShards(docs, 64))),
      // LangIdExpr's cost model at a PRODUCTION-size marker table (100
      // languages × 4-5 markers, same deterministic generator as the parity
      // property in PropertySpec): the one-pass expression does tokens × 1
      // hash lookups regardless of table width, the composed per-language
      // argmax walks the token array once PER language — this pair turns
      // the scaladoc's claimed gap into a measured number over the scaled
      // corpus (both forms return 'und' on corpus tokens; a miss still
      // pays each form's full walk, which is exactly the cost under test)
      "lang_id_expr_100" -> (() => noop(docs.select(col("doc_id"),
        graft.functions.GraftFunctions.langId(
          graft.functions.GraftFunctions.tokens(col("text")), BigMarkers)
          .as("lang_pred")))),
      "lang_id_composed_100" -> (() => noop(docs.select(col("doc_id"),
        graft.functions.GraftFunctions.langIdComposed(
          graft.functions.GraftFunctions.tokens(col("text")), BigMarkers)
          .as("lang_pred")))))

    // vector family at the same replication. Each copy gets a per-copy
    // PERMUTATION of the embedding dimensions: norm-preserving and
    // within-copy geometry-identical (a permutation is a rotation), while
    // cross-copy cosines decorrelate — so the scaled table behaves like
    // K independent shards of "more data", NOT K exact duplicates of every
    // point (which would hand the near-dup probes a synthetic quadratic
    // dup mass and confound the blocking comparison below — the same
    // adversarial-replication trap the text side avoids with token
    // prefixes).
    val vectorNames = Seq("knn_exact", "knn_batch", "ivf_build",
      "ann_ivf_probe", "contrast_near_dup_fixed_block", "ivf_build_wide", "near_dup_ivf")
    var nVecs = 0L
    val vectorProbes: Seq[(String, () => Unit)] = if (!wants(vectorNames: _*)) Seq.empty else {
    // shift STEP inside replicateEmb must be coprime to dim: with the old
    // fixed step 7, any copy i with 7i ≡ 0 (mod dim) — e.g. dim=70, i=10 —
    // would get the identity permutation and be an EXACT duplicate of the
    // base under new ids, exactly the adversarial K-dup mass this
    // construction exists to avoid. A coprime step s makes s·i ≡ 0 (mod
    // dim) impossible for 0<i<dim, which replicateEmb's require guards
    // (dim is read from data, not assumed).
    val emb = replicateEmb(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), replication)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nVecs = emb.count()
    val q0 = KnnExact.queryVector(emb, 0L)
    val qBatch = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val ivfDir = "target/scale-probe-ivf"
    var ivf: IvfIndex = null
    var ivfWide: IvfIndex = null
    Seq[(String, () => Unit)](
      "knn_exact" -> (() => noop(KnnExact.topK(emb, q0, 10))),
      "knn_batch" -> (() => noop(KnnBatch.topK(emb, qBatch, 10))),
      "ivf_build" -> (() => { ivf = IvfIndex.build(spark, emb, ivfDir, 16) }),
      "ann_ivf_probe" -> (() => noop(ivf.search(q0, 10, 4))),
      "contrast_near_dup_fixed_block" -> (() =>
        noop(Dedup.embeddingNearDupPairsFixedBlock(emb, 0.95))),
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
    }

    // ---- composed daily-ingest cycle (verdict r17 #6): IncrementalDrillSpec
    // proves the 4-day composed cycle CORRECT at test scale (six modalities,
    // rotation + compaction under a concurrent reader); this pair gives the
    // composed day a GROWTH measurement — the per-family incremental probes
    // above each have one, but nothing timed one WHOLE day. Split the
    // production way (the span_art_build / dup_span_share_inc pattern):
    //   drill_art_build — the once-per-bootstrap history artifacts of all
    //     six modalities (hash set, band table, span-window set, frame
    //     sketches + class quotient, shingle sets + labels + order sketch +
    //     prefix postings, the IVF index over permutation-replicated
    //     embeddings) plus the batch embedding slice, landed under the
    //     (sfDir, replication)-keyed dir like the other probe artifacts;
    //   drill_day — everything ONE ingest day pays: the six incremental
    //     probes over the batch, the batch-side artifact writes (run-local
    //     output dirs — history stays immutable, so the probe re-runs
    //     cleanly), the label rewrite, the merge-only IVF maintain and one
    //     serving search through the version pointer.
    // Run at x1 and x10 and the drill_day ratio IS the daily-cycle growth
    // law. Caveat (same as near_dup_ivf/ivf_build_wide): maintain appends a
    // segment into the index dir, so re-running drill_day without
    // co-selecting drill_art_build double-ingests the batch — the keyed
    // artifact contract makes that the caller's responsibility.
    val drillNames = Seq("drill_art_build", "drill_day")
    val drillProbes: Seq[(String, () => Unit)] =
      if (!wants(drillNames: _*)) Seq.empty else {
      val dRoot = s"$spanArtDir-drill"
      val dOut = s"$dRoot-out"
      val hist = docs.where(col("doc_id") % 10 =!= 9)
      val batch = docs.where(col("doc_id") % 10 === 9)
      import graft.multimodal.Multimodal
      Seq(
        "drill_art_build" -> (() => {
          Dedup.exact(hist).select(col("text_md5"))
            .write.mode("overwrite").parquet(s"$dRoot/hash")
          Dedup.lshBuckets(hist).write.mode("overwrite").parquet(s"$dRoot/bands")
          Dedup.spanWindowSet(hist).write.mode("overwrite").parquet(s"$dRoot/spanwin")
          Multimodal.phashFrames(hist, carry = Seq("lang"))
            .write.mode("overwrite").parquet(s"$dRoot/sketch")
          Multimodal.sketchClasses(spark.read.parquet(s"$dRoot/sketch"))
            .write.mode("overwrite").parquet(s"$dRoot/classes")
          CacheRegistry.release()
          Dedup.shingleSetsOf(hist).write.mode("overwrite").parquet(s"$dRoot/sets")
          Dedup.nearDupClusters(hist, 0.5)
            .write.mode("overwrite").parquet(s"$dRoot/labels")
          CacheRegistry.release()
          val cms = Dedup.shingleOrderCms(spark.read.parquet(s"$dRoot/sets"))
          val cmsPath = java.nio.file.Paths.get(s"$dRoot/cms.bin")
          val cmsTmp = cmsPath.resolveSibling("cms.bin.tmp")
          java.nio.file.Files.write(cmsTmp, cms)
          java.nio.file.Files.move(cmsTmp, cmsPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          Dedup.shinglePrefixesUnder(
              spark.read.parquet(s"$dRoot/sets"), cms, 0.5)
            .write.mode("overwrite").parquet(s"$dRoot/prefixes")
          CacheRegistry.release()
          val embK = replicateEmb(
            spark.read.parquet(s"$sfDir/embeddings.parquet"), replication)
          embK.where(col("vec_id") % 10 === 9)
            .write.mode("overwrite").parquet(s"$dRoot/embbatch")
          IvfIndex.publishLatest(spark, s"$dRoot/ivf-root",
            IvfIndex.build(spark, embK.where(col("vec_id") % 10 =!= 9),
              s"$dRoot/ivf-root/v1", 16).indexDir)
        }),
        "drill_day" -> (() => {
          // six probes, caches released between them — each pays its own
          // fills, the conservative polarity for a growth claim
          noop(Dedup.incrementalExact(batch,
            spark.read.parquet(s"$dRoot/hash")))
          CacheRegistry.release()
          noop(Dedup.lshCandidatePairsIncremental(batch,
            spark.read.parquet(s"$dRoot/bands")))
          CacheRegistry.release()
          noop(Dedup.dupSpanShareIncremental(batch,
            spark.read.parquet(s"$dRoot/spanwin")))
          CacheRegistry.release()
          noop(Multimodal.frameDupShareIncremental(batch,
            spark.read.parquet(s"$dRoot/sketch"),
            disjointHistoryClasses =
              Some(spark.read.parquet(s"$dRoot/classes"))))
          CacheRegistry.release()
          // the label REWRITE artifact is the clustering day's real output
          Dedup.nearDupClustersIncrementalPrebuilt(batch,
              spark.read.parquet(s"$dRoot/sets"),
              spark.read.parquet(s"$dRoot/prefixes"),
              java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(s"$dRoot/cms.bin")),
              spark.read.parquet(s"$dRoot/labels"), 0.5)
            .write.mode("overwrite").parquet(s"$dOut/labels")
          CacheRegistry.release()
          // batch-side artifact appends (run-local dirs: history immutable)
          Dedup.exact(batch).select(col("text_md5"))
            .write.mode("overwrite").parquet(s"$dOut/hash")
          Dedup.lshBuckets(batch).write.mode("overwrite").parquet(s"$dOut/bands")
          Dedup.spanWindowSet(batch).write.mode("overwrite").parquet(s"$dOut/spanwin")
          Multimodal.phashFrames(batch, carry = Seq("lang"))
            .write.mode("overwrite").parquet(s"$dOut/sketch")
          Dedup.shingleSetsOf(batch).write.mode("overwrite").parquet(s"$dOut/sets")
          CacheRegistry.release()
          // merge-only IVF maintain + one serving search through the pointer
          val serving = IvfIndex.loadLatest(spark, s"$dRoot/ivf-root")
          val segment = spark.read.parquet(s"$dRoot/embbatch")
          val (next, rebuilt) = serving.maintain(segment, maxLoadFactor = 1e9)
          require(!rebuilt, "drill day is the merge-only arm")
          noop(next.search(
            KnnExact.queryVector(segment, 9L), 10, nProbe = 4))
        }))
    }

    // ---- salted-join closed loop, measured (r10 verdict #5): a replicated
    // events fact with 90% of its rows funneled onto ONE user, joined to the
    // user dimension — plain shuffle join vs [[SkewJoin.saltedInner]] at the
    // salt count the hot-key report prescribes (hotKeyStream's batch twin →
    // saltsFromReport, the full closed loop). Both run with AQE and
    // broadcast DISABLED: this is the non-adaptive deployment SkewJoin
    // exists for — AQE's own skew split would hide the effect, and a
    // broadcast would remove the shuffle entirely. The pairwise delta is the
    // hot task's serialization: plain sends ~90% of the fact through one
    // sort-merge task; salted spreads it across `salts` tasks.
    val skewNames = Seq("skewjoin_setup", "skewjoin_plain", "skewjoin_salted")
    val skewProbes: Seq[(String, () => Unit)] = if (!wants(skewNames: _*)) Seq.empty else {
      // DEFERRED setup (ADVICE r11): building + persisting the replicated
      // fact/dim and collecting the hot-key report used to run eagerly at
      // seq-construction time — i.e. BEFORE the timing loop even started —
      // pinning the skewed fact through every earlier probe's measurement.
      // Now the materialization runs inside the skewjoin_setup probe (its
      // own labeled timing row, so the plain-vs-salted pair stays clean),
      // and the last SELECTED skew probe unpersists both frames when it
      // finishes so nothing stays pinned through the probes that follow.
      lazy val skewSetup: (DataFrame, DataFrame, Int) = {
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
          .select(col("event_id"), col("user_id"), col("value"))
        val evShift = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
        val fact = (0 until replication).map { i =>
          if (i == 0) ev
          else ev.withColumn("event_id", col("event_id") + lit(i * evShift))
            .withColumn("value", col("value") + lit(i * 0.019))
        }.reduce(_ unionByName _)
          .withColumn("user_id",
            when(col("event_id") % 10 < 9, lit(7L)).otherwise(col("user_id")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        fact.count()
        val dim = fact.select(col("user_id")).distinct()
          .withColumn("segment", concat(lit("seg_"), pmod(col("user_id"), lit(17))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        dim.count()
        // the monitor's prescription: batch twin of hotKeyStream over one
        // synthetic window → ceil(hot_factor) capped at slot count
        val report = graft.streaming.EventStreams.hotKeyStream(
          fact.withColumn("ts", lit("2026-01-01 00:30:00").cast("timestamp")),
          "user_id")
        val salts = SkewJoin.saltsFromReport(report)
        System.err.println(s"[scale-probe] skew report prescribes $salts salts")
        (fact, dim, salts)
      }
      def nonAdaptive(body: => Unit): Unit = {
        val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try body finally {
          spark.conf.set("spark.sql.adaptive.enabled", aqe)
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
        }
      }
      def release(): Unit = {
        val (fact, dim, _) = skewSetup
        fact.unpersist(blocking = false)
        dim.unpersist(blocking = false)
      }
      // the release rides the LAST skew probe the filter actually selects —
      // a filtered run executing setup/plain without salted must not leave
      // the replicated frames pinned through later probes (review r12)
      val lastSelected = skewNames
        .filter(n => probeFilter.forall(_.contains(n))).lastOption
      def withRelease(name: String)(body: => Unit): Unit =
        try body finally if (lastSelected.contains(name)) release()
      Seq(
        "skewjoin_setup" -> (() => withRelease("skewjoin_setup") { skewSetup; () }),
        "skewjoin_plain" -> (() => withRelease("skewjoin_plain") {
          val (fact, dim, _) = skewSetup
          nonAdaptive(noop(fact.join(dim, Seq("user_id"))))
        }),
        "skewjoin_salted" -> (() => withRelease("skewjoin_salted") {
          val (fact, dim, salts) = skewSetup
          nonAdaptive(noop(SkewJoin.saltedInner(fact, dim, "user_id", salts)))
        }))
    }

    // ---- relational/events family (r6 verdict gap #2: q01-q29 had zero
    // scale evidence, and it was exactly the family whose driver-bench
    // numbers degraded under ambient load with no independent datapoint to
    // fall back on). The Relational query code reads from an sfDir, so the
    // probe materializes a replicated directory under target/ (untimed) and
    // runs the EXACT production query functions against it — same code path
    // the gate measures, not probe-local re-implementations.
    //
    // Decorrelation discipline (same as the doc/vector probes): fact keys
    // shift by a disjoint range per copy so no key collides across copies;
    // amounts perturb by a tiny per-copy offset so no value distribution is
    // K identical spikes. lineitem and orders shift l_orderkey/o_orderkey by
    // the SAME per-copy delta, preserving the join fan-out exactly (each
    // order still matches its own lineitems and nothing else). Customers are
    // NOT replicated — "same customers, 10× the orders" is the realistic
    // growth axis, and it keeps the q03 star join's dim sides constant like
    // production. events shift user_id too: sessionization (q11) and funnel
    // (q28) state grows with user count, not just events-per-user.
    val relDir = "target/scale-probe-rel"
    val relBase = "target/scale-probe-rel-base"
    val wantsRel = probeFilter.forall(_.exists(n => n.startsWith("rel")))
    if (wantsRel) locally {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o  = spark.read.parquet(s"$sfDir/orders.parquet")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val okShift  = o.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
      val eidShift = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
      val uidShift = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
      def replicate(base: DataFrame)(mut: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until replication).map(i => if (i == 0) base else mut(base, i))
          .reduce(_ unionByName _)
      val liK = replicate(li) { (df, i) =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(i * okShift))
          .withColumn("l_extendedprice", col("l_extendedprice") + lit(i * 0.013))
      }
      val oK = replicate(o) { (df, i) =>
        df.withColumn("o_orderkey", col("o_orderkey") + lit(i * okShift))
          .withColumn("o_totalprice", col("o_totalprice") + lit(i * 0.017))
      }
      val evK = replicate(ev) { (df, i) =>
        df.withColumn("event_id", col("event_id") + lit(i * eidShift))
          .withColumn("user_id", col("user_id") + lit(i * uidShift))
          .withColumn("value", col("value") + lit(i * 0.011))
      }
      // both dirs written fresh (untimed): the 1× point re-uses the same
      // parquet layout/compression as the 10× point, so the two timings
      // differ only in row count — reading the pristine sfDir for the 1×
      // point would confound codec/row-group differences into the ratio
      def writeT(dir: String, name: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
      for (d <- Seq("customer", "nation", "region", "supplier", "part");
           dir <- Seq(relDir, relBase))
        writeT(dir, d, spark.read.parquet(s"$sfDir/$d.parquet"))
      writeT(relDir, "lineitem", liK); writeT(relBase, "lineitem", li)
      writeT(relDir, "orders", oK);    writeT(relBase, "orders", o)
      writeT(relDir, "events", evK);   writeT(relBase, "events", ev)
    }
    // events_sorted_range's probe time INCLUDES its one-off sorted-layout
    // build (forSfDir memoizes per dir, and each dir is probed once) — the
    // layout's one-range-shuffle amortized cost is itself a scale claim
    val relQueries = if (!wantsRel) Seq.empty[String]
    else Seq("q01_pricing_summary", "q03_region_revenue",
      "q09_events_hourly", "q11_user_sessions", "q12_props_extract",
      "q13_rollup_returns", "q26_order_event_outer", "q28_funnel",
      "events_sorted_range")
    val relationalProbes: Seq[(String, () => Unit)] =
      relQueries.map { q => s"rel1x_$q" ->
        (() => noop(SparkEntry.queries(q)(spark, relBase))) } ++
      relQueries.map { q => s"rel10x_$q" ->
        (() => noop(SparkEntry.queries(q)(spark, relDir))) }

    var errors = List.empty[String]
    val timings = (probes ++ vectorProbes ++ drillProbes ++ skewProbes ++ relationalProbes)
      .filter { case (name, _) => probeFilter.forall(_.contains(name)) }
      .map { case (name, run) =>
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
