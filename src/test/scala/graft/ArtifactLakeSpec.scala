package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{FrameSketchLake, VerifiedPairs}

/** Rebuild + content-parity drill for the r16 full-corpus lake artifacts
  * (VerifiedPairs, FrameSketchLake) — the [[IncrementalDrillSpec]] posture
  * for the per-corpus-version (non-append) artifact class: what a query
  * reads off the parquet artifact must be row-identical to the direct
  * in-session computation, and a deleted artifact must rebuild from source
  * on the next read (the driver wipes target/ every round, so the rebuild
  * path IS the production path). */
class ArtifactLakeSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  test("VerifiedPairs artifact == direct ngramJaccardPairs; rebuilds after delete") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val direct = rows(graft.operators.Dedup.ngramJaccardPairs(docs, 0.5))
    graft.CacheRegistry.release()
    VerifiedPairs.reset()
    val art = rows(VerifiedPairs.forSfDir(spark, sf0001, 0.5))
    graft.CacheRegistry.release()
    assert(art == direct, s"artifact diverged: ${art.size} vs ${direct.size}")
    assert(art.nonEmpty)
    // delete the on-disk table + drop the memo: next read must rebuild
    // from source, not die on the missing path
    val dir = new java.io.File("target/pair-table")
    if (dir.exists()) rm(dir)
    VerifiedPairs.reset()
    val rebuilt = rows(VerifiedPairs.forSfDir(spark, sf0001, 0.5))
    graft.CacheRegistry.release()
    assert(rebuilt == direct, "rebuild after delete diverged")
  }

  test("FrameSketchLake artifacts == direct sketch/quotient; classes derive from sketches") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val directSk = rows(
      graft.multimodal.Multimodal.phashFrames(docs, carry = Seq("lang")))
    graft.CacheRegistry.release()
    FrameSketchLake.reset()
    val artSk = rows(FrameSketchLake.sketches(spark, sf0001))
    assert(artSk == directSk, s"sketch artifact diverged: ${artSk.size} vs ${directSk.size}")
    val artCls = FrameSketchLake.classes(spark, sf0001)
    // the quotient artifact must be the quotient OF the sketch artifact
    val directCls = rows(graft.multimodal.Multimodal.sketchClasses(
      FrameSketchLake.sketches(spark, sf0001)))
    assert(rows(artCls) == directCls, "class quotient diverged")
    graft.CacheRegistry.release()
  }
}
