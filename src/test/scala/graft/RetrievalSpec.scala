package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IvfIndex, KnnExact, Retrieval, TextAnalysis}

/** Lexical/hybrid retrieval, unigram LM scoring, contamination scan, and
  * incremental IVF assignment. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docsFixture = Seq(
    (0L, "alpha beta alpha beta alpha beta", "en", "s0", 32L), // only common terms
    (1L, "alpha beta rare gamma delta epsilon", "en", "s0", 35L), // has the rare term
    (2L, "gamma delta epsilon zeta eta theta", "en", "s0", 34L), // no query terms
    (3L, "alpha gamma delta epsilon zeta eta", "en", "s0", 34L) // one common term
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("bm25: docs without query terms are absent; rare term dominates") {
    val r = Retrieval.bm25TopK(docsFixture, Seq("alpha", "rare"), 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(!r.contains(2L), s"doc 2 matches no term: $r")
    // doc 1 holds the rare term (df=1, idf max) -> outranks the tf-heavy doc 0
    assert(r(1L) > r(0L), s"rare-term doc must outrank common-term doc: $r")
    assert(r(0L) > r(3L), s"tf=3 must outrank tf=1 for the same term: $r")
    assert(r.values.forall(_ > 0))
  }

  test("bm25 matches a hand-computed score") {
    // corpus: 4 docs, dl = 6 each, avgdl = 6. term 'rare': df=1, tf in doc1 = 1
    val n = 4.0; val df = 1.0; val tf = 1.0
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val w = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * 6.0 / 6.0))
    val expected = BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Retrieval.bm25TopK(docsFixture, Seq("rare"), 10)
      .where(col("doc_id") === 1L).head().getDouble(1)
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }

  test("hybrid rrf fuses lexical and vector ranks with full-outer semantics") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qv = KnnExact.queryVector(emb, 0L)
    val terms = Seq("vector", "query", "dup")
    val fused = Retrieval.hybridRrf(docs, emb, terms, qv, 10, 50).collect()
    assert(fused.length == 10)
    // every rrf value decomposes as 1/(60+rl) + 1/(60+rv) with absent list -> 0
    fused.foreach { r =>
      val rl = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rv = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(rl.isDefined || rv.isDefined)
      val expect = rl.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      val rounded = BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(1) - rounded) < 1e-9)
    }
    // ordered by fused score, tie-break doc_id
    val scores = fused.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(scores == scores.sorted, "rrf output must be (rrf DESC, doc_id ASC)")
    // the vector query doc itself (vec_id 0, sim 1.0 -> rank 1) must surface
    assert(fused.exists(_.getLong(0) == 0L), "rank-1 vector hit must be fused in")
  }

  test("rerank cascade: results come from the BM25 candidate set, ordered by cosine") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qv = KnnExact.queryVector(emb, 0L)
    val terms = Seq("vector", "query", "dup")
    val cand = Retrieval.bm25TopK(docs, terms, 50).collect()
      .map(_.getLong(0)).toSet
    val r = Retrieval.rerankCosine(docs, emb, terms, qv, 10, 50).collect()
    assert(r.nonEmpty && r.length <= 10)
    assert(r.map(_.getLong(0)).toSet.subsetOf(cand),
      "every reranked row must be a stage-1 candidate")
    val sims = r.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
      s"rerank order must be sim DESC: ${sims.mkString(",")}")
    // stage-2 scores are the EXACT cosines for those ids (sim replaces bm25)
    val exact = KnnExact.topK(emb, qv, emb.count().toInt).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("sim")).toMap
    assert(r.forall(x => exact(x.getLong(0)) == x.getDouble(2)),
      "stage-2 score must equal the exact cosine for that id")
  }

  test("unigram logprob matches a hand-computed average") {
    val tiny = Seq(
      (0L, "a a b"), // corpus tf: a=3 (2 here + 1 in doc1), b=2
      (1L, "a b")
    ).toDF("doc_id", "text")
    // total tokens = 5; doc0: (2*ln(3/5) + 1*ln(2/5)) / 3
    val expected0 = (2 * math.log(3.0 / 5) + 1 * math.log(2.0 / 5)) / 3
    val r = TextAnalysis.unigramLogprob(tiny).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(0L)._1 == 3L)
    assert(math.abs(r(0L)._2 - expected0) < 1e-6)
    // the doc skewed toward the corpus-common token scores higher
    assert(r(0L)._2 > r(1L)._2)
  }

  test("contamination scan flags exactly the train docs sharing shingles with test docs") {
    // 40 ids over one shared text: split membership comes from the id hash,
    // shingle overlap is total -> every train doc must flag against every
    // test doc, and nothing else
    val text = "one two three four five six"
    val docs = (0L until 40L).map(i => (i, text, "en", "s0", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val bySplit = TextAnalysis.trainValTestSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val trainIds = bySplit.collect { case (id, "train") => id }.toSet
    val testIds = bySplit.collect { case (id, "test") => id }.toSet
    assume(testIds.nonEmpty, "fixture must land at least one test doc")
    val got = Dedup.benchmarkContamination(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == trainIds, s"flagged=$got train=$trainIds")
    val nShingles = 4L // 6 tokens -> 4 distinct 3-shingles
    got.values.foreach { case (ns, nt) =>
      assert(ns == nShingles && nt == testIds.size.toLong)
    }
    val plan = Dedup.benchmarkContamination(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "postings join must be keyed")
  }

  test("contamination class-quotient form == the bipartite posting join (randomized)") {
    // r15: the scan decomposed (membership semi-join + test shingle-set
    // class quotient) — parity against the pre-quotient train×test posting
    // join on a randomized corpus with partial overlaps, multi-doc classes
    // (repeated texts), and disjoint docs
    val rnd = new scala.util.Random(99)
    val pool = Vector.tabulate(18)(i => s"c$i")
    val texts = Vector.tabulate(12) { _ =>
      Seq.fill(4 + rnd.nextInt(9))(pool(rnd.nextInt(pool.size))).mkString(" ")
    }
    val docs = (0L until 60L).map { i =>
      (i, texts(rnd.nextInt(texts.size)), "en", "s0", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.benchmarkContamination(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.CacheRegistry.release()
    // reference: the naive bipartite form, inline
    val splits = TextAnalysis.trainValTestSplit(docs)
      .select(col("doc_id"), col("split"))
    val posts = Dedup.shingleSetRows(docs)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .join(splits, Seq("doc_id"))
    val want = posts.where(col("split") === "train").as("a")
      .join(posts.where(col("split") === "test").as("b"),
        col("a.s") === col("b.s"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(countDistinct(col("a.s")).as("n_shingles"),
        countDistinct(col("b.doc_id")).as("n_test_docs"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"quotient form diverged: missing=${want.toSet -- got.toSet}" +
      s" extra=${got.toSet -- want.toSet}")
    assert(got.nonEmpty, "fixture must produce contaminated train docs")
    graft.CacheRegistry.release()
  }

  test("assignNew picks the argmax-cosine centroid with (sim DESC, cluster ASC) ties") {
    val idx = IvfIndex.forSfDir(spark, sf0001, SparkEntry.NumClusters)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .where(col("vec_id") < 20)
    val got = idx.assignNew(emb).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.size == 20)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb) + 1e-8)
    }
    vecs.foreach { case (id, v) =>
      val best = idx.centroids
        .map { case (c, cv) =>
          (c, BigDecimal(cos(v, cv)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (c, s) => (-s, c) }.head
      assert(got(id) == best, s"vec $id: got ${got(id)} expected $best")
    }
  }
}
