package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full-corpus split-frozen shingle postings and the test-side class
  * posting view as real parquet artifacts (r19, the [[SpanWindowLake]] move
  * applied to the contamination scan — verdict r18 #2): the train×test
  * posting probe re-shingled the whole corpus and re-derived the test class
  * quotient per pass, rebuilding exactly what the split assignment froze —
  * both are per-(corpus version, split spec) statistics. In production the
  * postings are the ingest sink ([[graft.streaming.EventStreams
  * .shingleSetStream]]'s accumulated sets, exploded; the split column is a
  * pure doc_id projection) and the class postings are its per-version
  * compaction view over the TEST split — for a real decontamination
  * pipeline, the frozen benchmark suite. Landing them under target/ makes
  * `contamination_flags` pay only the membership probe + rollups.
  *
  *  - `postings` (doc_id, split, s) — partitioned BY SPLIT, so a serving
  *    scan of one split prunes whole directories (the
  *    [[ScrubbedLake]] read-path win); stamps the corpus signature
  *    (count + doc_id xor) AND the split-spec tag
  *    ([[graft.operators.TextAnalysis.splitSpecTag]]) in schema metadata;
  *  - `testClasses` (n_docs, cid, s) — the test shingle-set class postings,
  *    derived from the POSTINGS artifact (a rebuild never re-tokenizes);
  *  - `testShingles` (s) — the distinct test membership set, derived from
  *    `testClasses` (the broadcast side of the serving probe).
  *
  * Oracle SQL is UNCHANGED: every artifact is a deterministic function of
  * the documents table, so the DuckDB replay recomputes from source and a
  * mangled artifact byte hashes red. */
object ShinglePostingLake {

  private val cache = TrieMap[String, String]()

  /** Drop the in-JVM memo so the next read rebuilds from source — the
    * artifact-rebuild drill's hook (production analog: a version roll). */
  private[graft] def reset(): Unit = cache.clear()

  private def dir(sfDir: String, name: String): String =
    java.nio.file.Paths.get("target", "posting-lake", graft.SfPath.safe(sfDir),
      name).toAbsolutePath.toString

  private def build(spark: SparkSession, sfDir: String, name: String)
      (write: (DataFrame, String) => Unit): String =
    ArtifactMemo.getOrBuild(cache, s"$name#$sfDir") {
      val d = dir(sfDir, name)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      write(docs, d)
      d
    }

  /** Split-frozen shingle postings `(doc_id, split, s)`, split-partitioned
    * and identity-stamped. */
  def postings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(build(spark, sfDir, "postings") { (docs, d) =>
      val sig = docs.agg(count(lit(1)), expr("bit_xor(doc_id)")).head()
      val m = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(graft.operators.Dedup.CorpusCountKey, sig.getLong(0))
        .putLong(graft.operators.Dedup.CorpusXorKey,
          if (sig.isNullAt(1)) 0L else sig.getLong(1))
        .putString(graft.operators.Dedup.SplitSpecKey,
          graft.operators.TextAnalysis.splitSpecTag)
        .build()
      graft.operators.Dedup.shinglePostingsWithSplit(docs)
        .withColumn("s", col("s").as("s", m))
        .write.mode("overwrite").partitionBy("split").parquet(d)
    })

  /** Test-side shingle-set class postings `(n_docs, cid, s)` — derived
    * from the POSTINGS artifact's pruned test partition. */
  def testClasses(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(build(spark, sfDir, "test-classes") { (_, d) =>
      graft.operators.Dedup.testClassesFromPostings(postings(spark, sfDir))
        .write.mode("overwrite").parquet(d)
    })

  /** Distinct test shingle membership set `(s)` — derived from
    * [[testClasses]]; the serving probe's broadcast side. */
  def testShingles(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(build(spark, sfDir, "test-shingles") { (_, d) =>
      testClasses(spark, sfDir).select(col("s")).distinct()
        .write.mode("overwrite").parquet(d)
    })
}
