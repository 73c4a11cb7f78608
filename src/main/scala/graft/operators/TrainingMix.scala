package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheRegistry
import graft.functions.GraftFunctions._

/** Training-mix construction operators — the steps between a curated corpus
  * and a training run: the mix report ([[mixStats]]), temperature-scaled
  * sampling weights ([[mixWeights]]) and their epoch application
  * ([[mixSample]]), per-language quality cuts ([[topQualityPerLang]]),
  * fixed-budget sequence packing in doc order ([[packSequences]]) and in
  * shuffled per-shard order ([[packShards]]), and the deterministic global
  * shuffle ([[shuffleShards]]).
  *
  * All are relational plans designed so the same code runs at 100 TB: no
  * global sorts or single-task windows anywhere (packing's prefix-sum is
  * the two-job block form, mirroring [[graft.sources.JsonCorpus]]'s id
  * minting; shard/lang windows partition by their key), the only collects
  * are bounded group/block tables, shared group aggregates go through
  * [[CacheRegistry]], and every sampling/shuffle decision is an md5-derived
  * hash — reproducible across engines, reruns, and repartitioning.
  */
object TrainingMix {

  /** Data-mix report: docs / whitespace tokens / chars per (source, lang)
    * with ROLLUP margins — the table a pipeline publishes per snapshot so
    * mix drift is observable. One Expand+Aggregate pass (single shuffle).
    * GROUPING() markers make the sort total even on NULL-bearing data
    * (same contract as [[Relational.cubeOrderStats]]). */
  def mixStats(documents: DataFrame): DataFrame =
    documents
      .rollup(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        grouping(col("source")).as("gs"),
        grouping(col("lang")).as("gl"))
      .orderBy(col("source").asc_nulls_first, col("gs"),
        col("lang").asc_nulls_first, col("gl"))
      .drop("gs", "gl")

  /** Temperature-scaled sampling weights per (source, lang) group:
    * `p_g = n_g^α / Σ_h n_h^α` with α = 0.5 — upsamples low-resource
    * groups relative to proportional sampling (the standard multilingual
    * temperature trick). α is fixed at 1/2 so the power is `sqrt`, which
    * IEEE 754 requires correctly rounded — bit-identical across engines,
    * where a general `pow` is only faithfully rounded and may drift an ulp.
    * The normalizer is a fixed-order fold over the (few) groups (sorted by
    * (source, lang)), not an order-nondeterministic SUM, so the double
    * arithmetic is reproducible; group token counts themselves are exact
    * integer sums. Output adds the effective over/under-sampling factor
    * vs proportional (`boost = p_g / share_g`, rounded 6dp). */
  def mixWeights(documents: DataFrame): DataFrame = {
    // persisted: feeds both the normalizer fold and the final projection
    // (and mixSample's join) — one corpus scan, not two-per-call; the
    // cached table is ~|source×lang| rows
    val grouped = CacheRegistry.persist(documents
      .groupBy(col("source"), col("lang"))
      .agg(sum(size(tokens(col("text"))).cast("long")).as("n_tokens")))
    val folded = grouped
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("source"), col("lang"),
            sqrt(col("n_tokens").cast("double")).as("w")))),
          lit(0.0d), (acc, x) => acc + x.getField("w")).as("denom"),
        sum(col("n_tokens")).as("total_tokens"))
    grouped.crossJoin(broadcast(folded))
      .select(
        col("source"), col("lang"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast("double")) / col("denom"), 6).as("p"),
        round(sqrt(col("n_tokens").cast("double")) / col("denom") /
          (col("n_tokens").cast("double") / col("total_tokens")), 6).as("boost"))
      .orderBy(col("source"), col("lang"))
  }

  /** Default block size for the packing prefix-sum: `doc_id div blockSize`
    * is the block key, so block assignment needs no sampling or data
    * exchange. At ~100k docs/block the driver's prefix-sum table stays at
    * ~10^4 rows per 10^9 docs. The result is block-size-INVARIANT (the
    * decomposition reproduces the global prefix sum exactly — asserted in
    * TrainingMixSpec), so callers tune it purely for driver-table size:
    * pick `blockSize ≈ expected_docs / 10^4`. Tests pass small values to
    * exercise multi-block behavior on tiny corpora. */
  val DefaultPackBlockSize = 100000L

  /** Fixed-budget sequence packing (boundary form): documents in doc_id
    * order are laid head-to-tail and the sequence id is the bin its FIRST
    * token lands in: `seq_id = (cum_before_doc) div budget`. Greedy
    * head-to-tail packing is what loaders do when documents are concatenated
    * then split into windows; the boundary form makes it a pure prefix-sum,
    * expressible identically in both engines.
    *
    * Scale shape: a global `sum() over (order by doc_id)` window is a
    * single task at 100 TB. This is the two-job prefix-sum instead —
    * (1) per-block token sums, collected to the driver (one row per
    * `blockSize` docs — bounded, see [[DefaultPackBlockSize]]),
    * prefix-summed and broadcast back;
    * (2) a per-block cumsum window (parallel across blocks) plus the block
    * offset. Identical result to the global window, no single-task stage —
    * the same decomposition [[graft.sources.JsonCorpus]] uses for id
    * minting (reference analog: positional ids, loader.py). Returns one
    * row per sequence: doc span, doc count, token count, fill vs budget. */
  def packSequences(documents: DataFrame, budget: Long,
      blockSize: Long = DefaultPackBlockSize): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    require(blockSize > 0, s"pack block size must be positive, got $blockSize")
    val spark = documents.sparkSession
    val perDoc = CacheRegistry.persist(documents.select(
      col("doc_id"),
      // integer div, not double: doc_id / 1e5 loses exactness past 2^53
      // and block assignment must stay monotone in doc_id at any id range
      expr(s"doc_id div $blockSize").as("blk"),
      size(tokens(col("text"))).cast("long").as("n_tok")))
    // job 1: per-block totals → driver prefix sum → broadcast offsets.
    // One row per block on the driver: bounded (see DefaultPackBlockSize).
    val blockTotals = perDoc.groupBy(col("blk"))
      .agg(sum(col("n_tok")).as("blk_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix sum: tokens BEFORE each block's first doc
    var acc = 0L
    val before = blockTotals.map { case (blk, tok) =>
      val offset = acc; acc += tok; (blk, offset)
    }
    val beforeDf = spark.createDataFrame(before.toSeq).toDF("blk", "blk_offset")
    // job 2: within-block cumsum (parallel across blocks) + block offset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = perDoc
      .join(broadcast(beforeDf), Seq("blk"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tok")).over(w), lit(0L)) + col("blk_offset"))
      .withColumn("seq_id", expr(s"cum_before div $budget"))
    cum.groupBy(col("seq_id"))
      .agg(
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("seq_tokens"))
      .withColumn("fill", round(col("seq_tokens").cast("double") / budget, 6))
      .orderBy(col("seq_id"))
  }

  /** Per-language quality-quantile curation: keep the top `frac` of each
    * language's documents ranked by uniqueness ratio (distinct/total tokens,
    * the repetition signal [[TextAnalysis.quality]] computes), ties broken
    * by doc_id so the cut is total. Rank windows are PARTITIONED BY lang —
    * parallel across languages, never a single global sort; a skewed
    * dominant language bounds one partition's sort, the standard trade-off
    * of per-group order statistics (at extreme skew one would pre-threshold
    * with an approx-quantile sketch and rank only the boundary).
    * Ranking uses the 6-dp ROUNDED ratio (the engine-wide rank contract —
    * sorting unrounded diverges on near-ties across engines). */
  def topQualityPerLang(documents: DataFrame, frac: Double): DataFrame = {
    val staged = documents.select(
      col("doc_id"), col("lang"),
      explode(array(struct(tokens(col("text")).as("w")))).as("c"))
    val scored = staged.select(
      col("doc_id"), col("lang"),
      round(size(array_distinct(col("c.w"))).cast("double") /
        size(col("c.w")), 6).as("uniq_ratio"))
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val rankW = byLang.orderBy(desc("uniq_ratio"), asc("doc_id"))
    scored
      .withColumn("rk", row_number().over(rankW))
      .withColumn("n", count(lit(1)).over(byLang))
      .where(col("rk") <= ceil(lit(frac) * col("n")).cast("long"))
      .select(col("doc_id"), col("lang"), col("uniq_ratio"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Salt for the deterministic mix sample (versioned — bumping it redraws
    * the sample without touching code). */
  val MixSampleSalt = "graftmix1"

  /** Apply [[mixWeights]] as an epoch sample: group g receives an expected
    * `p_g × epochTokens` token budget, so its per-doc keep rate is
    * `min(1, p_g·T/n_g)` — small groups saturate at 1 (fully kept,
    * the temperature upsample), large groups are downsampled. The keep
    * decision is the engine-wide deterministic-sampling contract
    * ([[TextAnalysis.langBalancedSample]]): md5-derived h60 mod 10^6
    * against the 6-dp rounded rate scaled with floor(x+0.5) — portable
    * bit-for-bit, reproducible across engines and reruns, and stable under
    * repartitioning (a property rand()-based sampling lacks). One ~|groups|-
    * row broadcast join; the corpus scan stays embarrassingly parallel. */
  def mixSample(documents: DataFrame, epochTokens: Long): DataFrame = {
    val rates = mixWeights(documents).select(
      col("source"), col("lang"),
      round(least(lit(1.0d),
        col("p") * lit(epochTokens.toDouble) / col("n_tokens")), 6).as("rate"))
    val h = h60(concat(lit(MixSampleSalt), lit("#"), col("doc_id").cast("string")))
    // null-SAFE equality on the group keys: mixWeights' groupBy keeps a
    // NULL-source/lang group (it contributes to the normalizer), so the
    // join must match it too — a plain equality join would silently drop
    // those docs from every epoch
    documents.as("d")
      .join(broadcast(rates).as("r"),
        col("d.source") <=> col("r.source") && col("d.lang") <=> col("r.lang"))
      .where((h % 1000000L) <
        floor(col("rate") * lit(1000000.0d) + lit(0.5d)).cast("long"))
      .select(col("doc_id"), col("d.source").as("source"),
        col("d.lang").as("lang"), col("rate"))
      .orderBy(col("doc_id"))
  }

  /** Salt for the deterministic training shuffle (versioned so a re-shuffle
    * is a salt bump, not a code change). */
  val ShuffleSalt = "graftshuffle1"

  /** [[shuffleShards]] composed with the packing boundary rule INSIDE each
    * shard — the shape a data loader actually consumes: docs packed
    * head-to-tail in their shuffled (pseudo-random) order, sequences never
    * crossing shards. Strictly better scale posture than [[packSequences]]:
    * every window is partitioned by shard, so there is no prefix-sum job, no
    * driver collect, no global ordering ANYWHERE — one hash shuffle, then
    * embarrassingly parallel. (The doc_id-ordered [[packSequences]] exists
    * for reproducible curriculum-style packing; this is the shuffled-epoch
    * form.) Returns one row per (shard, sequence). */
  def packShards(documents: DataFrame, nShards: Int, budget: Long): DataFrame = {
    require(nShards > 0 && budget > 0,
      s"shard count and budget must be positive, got ($nShards, $budget)")
    val h = h60(concat(lit(ShuffleSalt), lit("#"), col("doc_id").cast("string")))
    val perDoc = documents.select(
      col("doc_id"), h.as("h"),
      size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perDoc
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before div $budget"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("seq_tokens"))
      .withColumn("fill", round(col("seq_tokens").cast("double") / budget, 6))
      .orderBy(col("shard"), col("seq_id"))
  }

  /** Deterministic global training shuffle: each doc's md5-derived 60-bit
    * hash gives it (a) a shard — `h mod nShards` — and (b) a pseudo-random
    * position WITHIN the shard (`row_number` over `h, doc_id`). Together the
    * shards are a reproducible random permutation of the corpus that data
    * loaders can consume independently: no global sort, one hash-partition
    * shuffle, per-shard windows parallel across shards. Same portable-hash
    * contract as [[TextAnalysis.splitBucket]] (md5-derived — identical in
    * any engine), so the shuffle order is stable across reruns AND across
    * engines — resumable training runs depend on exactly this property. */
  def shuffleShards(documents: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, s"shard count must be positive, got $nShards")
    val h = h60(concat(lit(ShuffleSalt), lit("#"), col("doc_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    documents
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }
}
