package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, TextAnalysis}

/** End-to-end curation pipeline invariants. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate composes filter, exact dedup, near-dup dedup, and split") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      (0L, base, "en", "s0", 120L),                       // survives
      (1L, base, "en", "s0", 120L),                       // exact dup of 0 -> dropped
      (2L, base + " extra", "en", "s0", 126L),            // near dup of 0 -> dropped
      (3L, "tiny doc", "en", "s0", 8L),                   // too_short -> dropped
      (4L, ("spam " * 30).trim, "en", "s0", 149L),        // repeated_token -> dropped
      (5L, "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty " +
        "t1 t2 t3 t4", "en", "s0", 120L)                  // survives (distinct text)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.curate(docs, 0.5).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(out.keySet == Set(0L, 5L), s"survivors: ${out.keySet}")
    val validSplits = Set("train", "val", "test")
    assert(out.values.forall(validSplits))
    // split assignment must agree with the standalone operator
    val splits = TextAnalysis.trainValTestSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    out.foreach { case (id, sp) => assert(sp == splits(id)) }
  }

  test("curate is deterministic and strictly shrinking on real data") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = CorpusPipeline.curate(docs, 0.5).orderBy(col("doc_id")).collect()
    val b = CorpusPipeline.curate(docs, 0.5).orderBy(col("doc_id")).collect()
    assert(a.sameElements(b), "curate must be deterministic")
    assert(a.length > 0 && a.length < docs.count(),
      s"curate must drop some docs and keep some: ${a.length}")
  }
}
