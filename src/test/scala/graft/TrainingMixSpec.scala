package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingMix

/** [[graft.operators.TrainingMix]] — mix reporting, temperature weights,
  * sequence packing, deterministic shard shuffle. */
class TrainingMixSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("mixStats rollup: leaf rows sum to margins and grand total") {
    val rows = TrainingMix.mixStats(docs).collect()
    val leaf = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(leaf.map(_.getAs[Long]("n_tokens")).sum ==
      grand.head.getAs[Long]("n_tokens"))
    assert(leaf.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("mixWeights: probabilities sum to ~1 and boost >1 iff below-average share") {
    val rows = TrainingMix.mixWeights(docs).collect()
    val pSum = rows.map(_.getAs[Double]("p")).sum
    assert(math.abs(pSum - 1.0) < 1e-4, s"p must normalize, got $pSum")
    // sqrt temperature: boost_g = (√n_g/Σ√n)/(n_g/N) > 1 ⟺ √n_g < N/Σ√n
    val total = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val denom = rows.map(r => math.sqrt(r.getAs[Long]("n_tokens").toDouble)).sum
    val cutoff = total / denom
    rows.foreach { r =>
      val s = math.sqrt(r.getAs[Long]("n_tokens").toDouble)
      val boost = r.getAs[Double]("boost")
      assert((boost > 1.0) == (s < cutoff) || math.abs(boost - 1.0) < 1e-3,
        s"boost $boost inconsistent with sqrt(n)=$s vs cutoff $cutoff")
    }
  }

  test("packSequences two-job prefix sum equals a global-window reference") {
    import spark.implicits._
    val budget = 512L
    val blockSize = 50L
    val packed = TrainingMix.packSequences(docs, budget, blockSize).collect()
    // reference: single global cumsum on the driver
    val perDoc = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    var cum = 0L
    val expected = perDoc.map { case (id, n) =>
      val seq = cum / budget; cum += n; (seq, id, n)
    }.groupBy(_._1).map { case (seq, g) =>
      (seq, g.map(_._2).min, g.map(_._2).max, g.length.toLong, g.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val got = packed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, "block prefix-sum must equal the global cumsum")
    // multi-block coverage: the fixture must actually span several blocks
    assert(perDoc.map(_._1 / blockSize).distinct.length > 1,
      "fixture spans one block — test would not exercise the offset join")
    // every sequence's fill is positive and sequences are dense from 0
    assert(packed.head.getLong(0) == 0L)
  }

  test("packSequences result is invariant to the prefix-sum block size") {
    // the block decomposition must reproduce the global prefix sum exactly
    // for ANY block size — callers tune blockSize purely for driver-table
    // size (see DefaultPackBlockSize scaladoc), never semantics
    val budget = 512L
    def run(bs: Long) =
      TrainingMix.packSequences(docs, budget, bs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    val base = run(TrainingMix.DefaultPackBlockSize) // single block at sf0.001
    assert(run(7L) == base, "blockSize=7 diverges from default")
    assert(run(200L) == base, "blockSize=200 diverges from default")
    assert(run(1L) == base, "blockSize=1 (one row per block) diverges")
  }

  test("topQualityPerLang keeps exactly ceil(frac*n) best-ranked docs per lang") {
    val kept = TrainingMix.topQualityPerLang(docs, 0.25).collect()
    val perLangTotal = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = kept.groupBy(_.getString(1))
    perLangTotal.foreach { case (lang, n) =>
      val want = math.ceil(0.25 * n).toLong
      assert(keptByLang.get(lang).map(_.length.toLong).getOrElse(0L) == want,
        s"lang $lang: expected $want of $n docs")
    }
    // ranks are dense from 1 and scores non-increasing within a language
    keptByLang.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rows.length).toSeq)
      val scores = sorted.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted(Ordering[Double].reverse),
        "uniq_ratio must be non-increasing in rank")
    }
  }

  test("mixSample saturates small groups at rate 1 and downsamples large ones") {
    val sampled = TrainingMix.mixSample(docs, 10000L)
    val rates = sampled.select("source", "lang", "rate").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
    val n = TrainingMix.mixWeights(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_tokens")).toMap
    // at T = 10k over a ~25k-token corpus, some group must be saturated and
    // some downsampled, or the fixture isn't exercising both branches
    assert(rates.values.exists(_ == 1.0), "no saturated group")
    assert(rates.values.exists(_ < 1.0), "no downsampled group")
    // rate-1 groups are kept in full
    rates.collect { case (key, 1.0) => key }.foreach { case (src, lg) =>
      val total = docs.where(col("source") === src && col("lang") === lg).count()
      val kept = sampled.where(col("source") === src && col("lang") === lg).count()
      assert(kept == total, s"saturated group ($src,$lg) lost docs: $kept/$total")
    }
    // determinism
    assert(sampled.collect().map(_.getLong(0)).toSeq ==
      TrainingMix.mixSample(docs, 10000L).collect().map(_.getLong(0)).toSeq)
  }

  test("mixWeights/mixSample keep NULL-key groups (null-safe join)") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c", null.asInstanceOf[String], "web", 5L),
      (2L, "d e", "en", null.asInstanceOf[String], 3L),
      (3L, "f g h i", "en", "web", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = TrainingMix.mixWeights(df).collect()
    graft.CacheRegistry.release()
    assert(w.length == 3 && math.abs(w.map(_.getAs[Double]("p")).sum - 1.0) < 1e-4,
      "NULL-key groups must carry weight in the normalizer")
    // epoch budget far above corpus size → every rate saturates at 1 →
    // every doc, including NULL-key ones, must survive the join
    val kept = TrainingMix.mixSample(df, 1000000L).collect()
    graft.CacheRegistry.release()
    assert(kept.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
      s"NULL-key docs dropped: kept ${kept.map(_.getLong(0)).toSeq}")
  }

  test("packShards conserves docs/tokens and agrees with shuffleShards order") {
    val n = 8
    val packed = TrainingMix.packShards(docs, n, 512L).collect()
    assert(packed.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // per shard: seq ids dense from 0; replay one shard's packing from the
    // shuffle order and per-doc token counts
    val shardRows = TrainingMix.shuffleShards(docs, n).collect()
      .filter(_.getInt(1) == 0).sortBy(_.getInt(2)).map(_.getLong(0))
    val tok = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    val refCounts = shardRows.map { id =>
      val s = cum / 512L; cum += tok(id); s
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val gotCounts = packed.filter(_.getInt(0) == 0)
      .map(r => r.getLong(1) -> r.getAs[Long]("n_docs")).toMap
    assert(gotCounts == refCounts, "shard-0 packing must replay shuffle order")
  }

  test("shuffleShards: a permutation, deterministic, dense positions per shard") {
    val n = 8
    val a = TrainingMix.shuffleShards(docs, n).collect()
    val b = TrainingMix.shuffleShards(docs, n).collect()
    assert(a.map(_.getLong(0)).toSet == docs.select("doc_id").collect()
      .map(_.getLong(0)).toSet, "every doc appears exactly once")
    assert(a.length == docs.count())
    assert(a.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq,
      "shuffle must be deterministic across runs")
    a.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < n)
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length).toSeq,
        s"shard $shard positions must be dense 1..n")
    }
    // all shards populated at 500 docs (hash balance sanity)
    assert(a.map(_.getInt(1)).distinct.length == n)
  }
}
