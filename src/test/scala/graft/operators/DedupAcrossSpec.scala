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
}
