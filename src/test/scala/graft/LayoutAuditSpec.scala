package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.LayoutAudit

/** The scan-layout audit: the same rows written as one file vs many part
  * files must be told apart, the row-group cap must bound the task estimate,
  * and tiny dimension tables must never be flagged. */
class LayoutAuditSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"layout-audit-$name").toString

  test("single-file big table is flagged starved; part-file layout is not") {
    val dir = tmp("flag")
    val df = spark.range(20000).select(
      col("id"), concat_ws("-", lit("pad"), col("id")).as("s"))
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/one.parquet")
    df.repartition(8).write.mode("overwrite").parquet(s"$dir/many.parquet")

    val one = LayoutAudit.auditTable(spark, s"$dir/one.parquet", "one", minBytes = 1L)
    val many = LayoutAudit.auditTable(spark, s"$dir/many.parquet", "many", minBytes = 1L)

    assert(one.files === 1L)
    assert(one.rowGroups >= 1L)
    assert(one.estScanTasks === 1L,
      "one small file = one row group = one effective scan task")
    assert(one.starved, s"expected starved, got $one")
    assert(one.advice.contains("rewrite"))

    assert(many.files === 8L)
    assert(many.rowGroups >= 8L)
    assert(many.estScanTasks >= 2L)
    assert(!many.starved, s"expected not starved, got $many")
    assert(many.advice === "ok")
  }

  test("minBytes gate keeps tiny dims unflagged even as single files") {
    val dir = tmp("dims")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(s"$dir/dim.parquet")
    val t = LayoutAudit.auditTable(spark, s"$dir/dim.parquet", "dim")
    assert(t.files === 1L && !t.starved && t.advice === "ok")
  }

  test("missing table reports zero files, not an exception") {
    val t = LayoutAudit.auditTable(spark, "/nonexistent/xyz.parquet", "ghost")
    assert(t.files === 0L && t.bytes === 0L && t.estScanTasks === 0L)
    assert(t.advice === "missing table")
  }

  test("audit over an sfDir returns one row per table with exact file counts") {
    val out = LayoutAudit.audit(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === LayoutAudit.DefaultTables.toSet)
    // Driver-generated sfDirs are single-file per table.
    assert(out.values.forall(_ === 1L), s"got $out")
  }

  test("suggestedFiles scales with bytes and never starves the cluster") {
    val cores = 32
    assert(LayoutAudit.suggestedFiles(1L << 20, cores) >= 1)
    // A 10 GB table should fan past the core count at 32 MB per file.
    assert(LayoutAudit.suggestedFiles(10L << 30, cores) === 320)
    // A 100 MB table on 32 cores: size rule says 4, floor keeps it >= min(cores, MBs).
    val hundredMb = LayoutAudit.suggestedFiles(100L << 20, cores)
    assert(hundredMb >= 4 && hundredMb <= cores)
  }

  test("suggestion satisfies the audit's own starvation threshold (r15 fix)") {
    val cores = 32
    // every auditable size (>= the 8 MB minBytes gate) must suggest at
    // least cores/2 files, or the prescribed rewrite re-flags itself —
    // the 10.8 MB lineitem case that kept layout_starved on the mirror
    Seq(8L << 20, (108L << 20) / 10, 16L << 20, 31L << 20).foreach { bytes =>
      assert(LayoutAudit.suggestedFiles(bytes, cores) >= cores / 2,
        s"suggestion for $bytes bytes starves the audit's own threshold")
    }
  }
}
