package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, KnnBatch, SqQuant, TextAnalysis}

/** Degenerate-input robustness: empty tables, empty batches, single rows —
  * the shapes a long-running pipeline hits at partition boundaries and on
  * cold starts. Every operator must return an EMPTY (or correct tiny) result,
  * never throw. */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String, String, Long)].toDF("doc_id", "text", "lang", "n_chars")

  test("dedup family on an empty corpus returns empty, not errors") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.minhashSignatures(emptyDocs).count() == 0)
    assert(Dedup.lshCandidatePairs(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, 0.5).count() == 0)
    assert(Dedup.ngramSurvivors(emptyDocs, 0.5).count() == 0)
  }

  test("text analysis on empty and single-token docs") {
    assert(TextAnalysis.quality(emptyDocs).count() == 0)
    assert(TextAnalysis.corpusFilter(emptyDocs).count() == 0)
    assert(TextAnalysis.vocabulary(emptyDocs, 10).count() == 0)
    val one = Seq((1L, "solo", "en", 4L)).toDF("doc_id", "text", "lang", "n_chars")
    val q = TextAnalysis.quality(one).head()
    assert(q.getAs[Int]("n_tokens") == 1 && q.getAs[Double]("uniq_ratio") == 1.0)
    val f = TextAnalysis.corpusFilter(one).head()
    assert(!f.getAs[Boolean]("keep") && f.getAs[String]("reason") == "too_short")
  }

  test("training-mix family on empty and degenerate corpora") {
    import graft.operators.TrainingMix
    val emptyFull = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // empty: no groups, no sequences, no shards — and no throw
    assert(TrainingMix.mixStats(emptyFull).count() == 0)
    assert(TrainingMix.mixWeights(emptyFull).count() == 0)
    assert(TrainingMix.packSequences(emptyFull, 512L).count() == 0)
    assert(TrainingMix.shuffleShards(emptyFull, 8).count() == 0)
    assert(TrainingMix.mixSample(emptyFull, 1000L).count() == 0)
    assert(TrainingMix.topQualityPerLang(emptyFull, 0.25).count() == 0)
    assert(TextAnalysis.bigramMerges(emptyFull, 10).count() == 0)
    // one single-token doc: a lone group at rate 1, one sequence, one shard
    val one = Seq((1L, "solo", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TrainingMix.mixWeights(one).head().getAs[Double]("p") == 1.0)
    val packed = TrainingMix.packSequences(one, 512L).head()
    assert(packed.getAs[Long]("seq_id") == 0L && packed.getAs[Long]("n_docs") == 1L)
    assert(TrainingMix.mixSample(one, 1000L).count() == 1, "rate saturates at 1")
    assert(TextAnalysis.bigramMerges(one, 10).count() == 0, "no adjacent pair")
  }

  test("r6 operators on empty and degenerate corpora") {
    val emptyFull = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextAnalysis.tokenEntropy(emptyFull).count() == 0)
    assert(TextAnalysis.bigramLogprob(emptyFull).count() == 0)
    assert(TextAnalysis.pmiBigrams(emptyFull, 1L, 10).count() == 0)
    assert(Dedup.ngramNovelty(emptyFull).count() == 0)
    graft.CacheRegistry.release()
    // one single-token doc: entropy 0, no bigrams anywhere, no shingles
    val one = Seq((1L, "solo", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = TextAnalysis.tokenEntropy(one).head()
    assert(e.getAs[Long]("n_tokens") == 1L &&
      e.getAs[Double]("entropy_nats") == 0.0)
    assert(TextAnalysis.bigramLogprob(one).count() == 0)
    assert(TextAnalysis.pmiBigrams(one, 1L, 10).count() == 0)
    assert(Dedup.ngramNovelty(one).count() == 0, "<3 tokens → no shingles")
    graft.CacheRegistry.release()
  }

  test("batch kNN with an empty query batch returns empty") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val noQueries = Seq.empty[(Long, Seq[Float])].toDF("query_id", "embedding")
    assert(KnnBatch.topK(emb, noQueries, 5).count() == 0)
  }

  test("k larger than the table returns every row, still ordered") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qv = graft.operators.KnnExact.queryVector(emb, 0L)
    val n = emb.count()
    val rows = graft.operators.KnnExact.topK(emb, qv, (n + 100).toInt).collect()
    assert(rows.length == n)
    val sims = rows.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("retrieval/pipeline ops on degenerate inputs") {
    // BM25: a term absent from every doc contributes nothing; all-absent
    // terms -> empty result (no doc matches)
    assert(graft.operators.Retrieval
      .bm25TopK(emptyDocs, Seq("nosuchterm"), 5).count() == 0)
    val one = Seq((1L, "alpha beta", "en", 10L)).toDF("doc_id", "text", "lang", "n_chars")
    val r = graft.operators.Retrieval.bm25TopK(one, Seq("alpha", "missing"), 5).collect()
    assert(r.length == 1 && r.head.getLong(0) == 1L && r.head.getDouble(1) > 0)
    // chunking: empty corpus, and a doc shorter than the stride
    assert(TextAnalysis.chunk(emptyDocs).count() == 0)
    assert(TextAnalysis.boilerplate(emptyDocs).count() == 0)
    assert(TextAnalysis.unigramLogprob(emptyDocs).count() == 0)
    assert(TextAnalysis.oovRate(emptyDocs).count() == 0)
    assert(Dedup.benchmarkContamination(emptyDocs).count() == 0)
    assert(graft.operators.CorpusPipeline.curate(emptyDocs).count() == 0)
  }

  test("assignNew with an empty batch and connected components on no edges") {
    val idx = graft.operators.IvfIndex.forSfDir(spark, sf0001, SparkEntry.NumClusters)
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(idx.assignNew(emptyVecs).count() == 0)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.ConnectedComponents.run(noEdges).count() == 0)
  }

  test("r5-close operators on empty and degenerate inputs") {
    import graft.operators.BqQuant
    // empty corpus: estimates, incremental dedup, length report all empty
    assert(Dedup.minhashEstPairs(emptyDocs).count() == 0)
    assert(Dedup.incrementalExact(emptyDocs,
      emptyDocs.selectExpr("text AS text_md5")).count() == 0)
    assert(TextAnalysis.lengthBuckets(emptyDocs).count() == 0)
    // empty embedding table: BQ codes/search yield empty, never throw
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    assert(BqQuant.codes(emptyEmb, 64).count() == 0)
    assert(BqQuant.search(emptyEmb, Array.fill(64)(0.1f), 5, 64).count() == 0)
    // all-negative vector packs to (0, 0): the zero code is a legal point
    val allNeg = Seq((7L, Seq.fill(64)(-1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val z = BqQuant.codes(allNeg, 64).head()
    assert(z.getAs[Long]("lo") == 0L && z.getAs[Long]("hi") == 0L)
    // n_chars = 0 rows are excluded from the histogram, not a crash
    val zeroLen = Seq((1L, "", "en", 0L)).toDF("doc_id", "text", "lang", "n_chars")
    assert(TextAnalysis.lengthBuckets(zeroLen).count() == 0)
  }

  test("funnel stages are monotone nonincreasing; retention offsets are cohort-anchored") {
    import graft.operators.Relational
    val f = Relational.conversionFunnel(spark, sf0001).head()
    assert(f.getLong(0) >= f.getLong(1) && f.getLong(1) >= f.getLong(2),
      s"ordered funnel must shed users at each stage: $f")
    assert(f.getLong(0) > 0, "the synthetic events must produce viewers")
    val r = Relational.cohortRetention(spark, sf0001).collect()
    assert(r.forall(_.getAs[Long]("week_offset") >= 0), "offsets are forward-looking")
    // every cohort has its own week-0 row: a user is active in the week of
    // their first event by definition
    val by = r.groupBy(_.getAs[Long]("cohort_week"))
    assert(by.values.forall(_.exists(_.getAs[Long]("week_offset") == 0L)),
      s"missing week-0 presence: ${r.mkString(",")}")
    graft.CacheRegistry.release()
  }

  test("quantization of a constant column (zero range) is stable zeros") {
    val df = Seq(Tuple1(Seq(1f, 2f)), Tuple1(Seq(1f, 2f))).toDF("embedding")
    val mns = Array(1.0, 2.0)
    val mxs = Array(1.0, 2.0) // max == min in every dim
    val codes = df.select(SqQuant.quantizeCol(col("embedding"), mns, mxs).as("q"))
      .collect().map(_.getAs[scala.collection.Seq[Int]]("q"))
    assert(codes.forall(_.forall(_ == 0)), codes.toSeq)
    val dq = df.select(SqQuant.dequantizeCol(
        SqQuant.quantizeCol(col("embedding"), mns, mxs), mns, mxs).as("v"))
      .head().getAs[scala.collection.Seq[Double]]("v")
    assert(dq == Seq(1.0, 2.0), s"constant dims must round-trip exactly: $dq")
  }

  test("key skew report: hand-computable hot-key factor and top-k share") {
    import spark.implicits._
    import graft.operators.Relational
    // key 'a' carries 6 of 10 rows; 4 distinct keys
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val r = Relational.keySkewReport(df, "k", topK = 2).head()
    assert(r.getAs[Long]("n_keys") == 4 && r.getAs[Long]("n_rows") == 10
      && r.getAs[Long]("max_rows") == 6, s"counts wrong: $r")
    // hot_factor = max/mean = 6 / (10/4) = 2.4; top2 = (6+2)/10 = 0.8
    assert(r.getAs[Double]("hot_factor") == 2.4, s"hot_factor: $r")
    assert(r.getAs[Double]("topk_share") == 0.8, s"topk_share: $r")
    graft.CacheRegistry.release()
  }

  test("key skew report plans a bounded top-k, never a global window") {
    import graft.operators.Relational
    val plan = Relational.keySkewReport(
        spark.read.parquet(s"$sf0001/events.parquet"), "user_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k concentration must be a bounded heap:\n${plan.take(600)}")
    assert(!plan.contains("Window"), "no global window at any key cardinality")
    graft.CacheRegistry.release()
  }
}
