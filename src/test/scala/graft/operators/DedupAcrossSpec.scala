package graft.operators

import org.apache.spark.sql.functions._

/** Cross-relation set-similarity join invariants that need package-private
  * access (the suite lives in `graft.operators` for exactly that reason —
  * [[Dedup.jaccardPairsAcross]] is the incremental clustering's candidate
  * engine and its contracts must hold at the source, not just through the
  * one public consumer that happens to tolerate violations). */
class DedupAcrossSpec extends graft.SparkSpec {
  import spark.implicits._

  test("jaccardPairsAcross: a re-ingested doc_id never emits a self-pair") {
    // ADVICE r15: the documented disjoint-id precondition was not enforced —
    // a daily batch re-ingesting an id already in the history artifact would
    // flow through least/greatest as doc_a == doc_b (jaccard 1.0), breaking
    // the doc_a < doc_b invariant downstream consumers assume. The candidate
    // join now carries the id-inequality predicate; identical TEXT under a
    // different id must still pair.
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val hist = Seq((10L, t, "en"), (20L, "unrelated words here nothing shared at all ok", "en"))
      .toDF("doc_id", "text", "lang")
    val batch = Seq((10L, t, "en"), (11L, t, "en")).toDF("doc_id", "text", "lang")
    val pairs = Dedup.jaccardPairsAcross(
        Dedup.shingledDocs(batch), Dedup.shingleSetsOf(hist), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a < b },
      s"doc_a < doc_b invariant violated: $pairs")
    // the duplicate-content pair across DIFFERENT ids must survive the guard
    assert(pairs.contains((10L, 11L)), s"cross pair lost: $pairs")
    graft.CacheRegistry.release()
  }

  test("prebuilt across form is bit-identical to the plain form") {
    // verdict r16 #1: the serving form swaps the union order sketch for a
    // stored history-only one and reads history prefixes from an artifact.
    // The prefix rule is sound under ANY shared total order, so the verified
    // output must be identical — candidates may differ, pairs may not.
    val mk = (id: Long, words: String) => (id, words, "en")
    val hist = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog today again"),
      mk(2L, "the quick brown fox jumps over the lazy dog today still"),
      mk(3L, "completely different text with no shared shingles at all here"),
      mk(4L, "boiler plate header boiler plate header boiler plate header x"))
      .toDF("doc_id", "text", "lang")
    val batch = Seq(
      mk(101L, "the quick brown fox jumps over the lazy dog today again"),
      mk(102L, "boiler plate header boiler plate header boiler plate header y"),
      mk(103L, "nothing in common with anything anywhere ever truly novel"))
      .toDF("doc_id", "text", "lang")
    val histSets = Dedup.shingleSetsOf(hist)
    val batchSh = Dedup.shingledDocs(batch)
    val plain = Dedup.jaccardPairsAcross(batchSh, histSets, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cms = Dedup.shingleOrderCms(histSets)
    val pref = Dedup.shinglePrefixesUnder(histSets, cms, 0.5)
    val prebuilt = Dedup.jaccardPairsAcrossPrebuilt(
        batchSh, histSets, pref, cms, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prebuilt === plain, s"prebuilt $prebuilt != plain $plain")
    assert(plain.nonEmpty, "fixture should produce at least one cross pair")
    graft.CacheRegistry.release()
  }

  test("prebuilt incremental clustering matches the plain incremental form") {
    val mk = (id: Long, words: String) => (id, words, "en")
    val hist = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      mk(3L, "totally unrelated content lives in this history document now"))
      .toDF("doc_id", "text", "lang")
    val batch = Seq(
      mk(11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(12L, "fresh singleton content that matches nothing else at all"))
      .toDF("doc_id", "text", "lang")
    val histSets = Dedup.shingleSetsOf(hist)
    val labels = Dedup.nearDupClusters(hist, 0.5)
    val plain = Dedup.nearDupClustersIncremental(batch, histSets, labels, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cms = Dedup.shingleOrderCms(histSets)
    val pref = Dedup.shinglePrefixesUnder(histSets, cms, 0.5)
    val prebuilt = Dedup.nearDupClustersIncrementalPrebuilt(
        batch, histSets, pref, cms, labels, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prebuilt === plain, s"prebuilt $prebuilt != plain $plain")
    assert(plain.exists(_._1 == 11L), s"batch dup should be labeled: $plain")
    graft.CacheRegistry.release()
  }

  test("a prebuilt prefix artifact refuses a probe at a different τ") {
    // ADVICE r17: the prefix lengths bake the build threshold in, so a
    // mismatched probe is silently UNSOUND (missed duplicates), not an
    // error. The artifact now carries its τ in schema metadata — which must
    // survive the parquet round trip — and the probe require()s equality.
    val hist = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta", "en"))
      .toDF("doc_id", "text", "lang")
    val batch = Seq((11L, "alpha beta gamma delta epsilon zeta eta iota", "en"))
      .toDF("doc_id", "text", "lang")
    val histSets = Dedup.shingleSetsOf(hist)
    val cms = Dedup.shingleOrderCms(histSets)
    val dir = java.nio.file.Files.createTempDirectory("tau-pin").toString
    Dedup.shinglePrefixesUnder(histSets, cms, 0.5)
      .write.mode("overwrite").parquet(dir)
    val pref = spark.read.parquet(dir)
    assert(Dedup.prefixTauOf(pref) === Some(0.5),
      "τ metadata must survive the parquet round trip")
    val ex = intercept[IllegalArgumentException](
      Dedup.jaccardPairsAcrossPrebuilt(
        Dedup.shingledDocs(batch), histSets, pref, cms, 0.6))
    assert(ex.getMessage.contains("0.5") && ex.getMessage.contains("0.6"),
      s"mismatch message should name both thresholds: ${ex.getMessage}")
    // the matched probe still runs (and the legacy no-metadata path stays
    // permissive — pre-r18 artifacts fall back to the caller's convention)
    Dedup.jaccardPairsAcrossPrebuilt(
      Dedup.shingledDocs(batch), histSets, pref, cms, 0.5).collect()
    val legacy = pref.withColumn("rk",
      col("rk").as("rk", org.apache.spark.sql.types.Metadata.empty))
    assert(Dedup.prefixTauOf(legacy).isEmpty)
    Dedup.jaccardPairsAcrossPrebuilt(
      Dedup.shingledDocs(batch), histSets, legacy, cms, 0.6).collect()
    graft.CacheRegistry.release()
  }
}
