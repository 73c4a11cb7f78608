package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{h60, h60Sql}

/** Train/val/test split ASSIGNMENT — the missing producer half of the
  * split-hygiene family (split_leak_pairs and contamination_flags DETECT
  * leakage; these operators construct assignments that don't leak in the
  * first place). Three forms, same output contract `(…, split STRING)`:
  *
  *   - [[splitAssign]] — deterministic hash split: zero-shuffle map
  *     expression, the 100 TB default. Proportions hold in expectation
  *     (binomial concentration makes the error negligible at corpus
  *     scale).
  *   - [[splitAssignStratified]] — EXACT per-stratum quotas via one
  *     window over the strata columns; for when "10% of every (source,
  *     lang) cell" is a hard requirement, not an expectation.
  *   - [[splitAssignLeakFree]] — near-duplicate clusters land in ONE
  *     split: assignment hashes the cluster representative instead of the
  *     doc, so a boilerplate lineage can never straddle train and test
  *     (the contamination mode split_leak_pairs exists to catch).
  *
  * Reproducibility contract: assignment is a pure function of
  * (salt, key) via the portable md5-derived h60 — the same convention the
  * dedup family's oracles replay — so DuckDB reproduces every assignment
  * bit-for-bit, re-runs are stable across sessions/machines, and adding
  * documents never reassigns existing ones (the hash split and leak-free
  * forms; the stratified form's quotas are corpus-relative by design).
  * Fraction thresholds are MILLIONTHS (integer arithmetic end-to-end):
  * `bucket = h60(salt:key) mod 1e6` compared against cumulative
  * thresholds, and the stratified rank test is `rn · 1e6 ≤ cum · total` —
  * no floating-point boundary can drift between engines.
  *
  * Relationship to [[TextAnalysis.splitFor]]: that is the FROZEN 80/10/10
  * 100-bucket convention the leak DETECTORS (split_leak_pairs,
  * contamination_flags, the streaming curation ingest) replay — it cannot
  * change without invalidating their baked oracle contracts. This family
  * is the parameterized producer (arbitrary spec/salt/key, millionths
  * resolution, stratified and leak-free variants); new pipelines assign
  * with these, the detectors keep their frozen reference split.
  *
  * Scale shapes: hash split is map-side only (no exchange; survives any
  * corpus). Stratified pays ONE window shuffle partitioned by the strata
  * columns — exact quotas are inherently rank-based; a single giant
  * stratum serializes its own window, which is the price of exactness
  * (use the hash form when expectation-accuracy suffices). Leak-free adds
  * one join against the cluster-label table, which holds only CLUSTERED
  * docs (the duplicate fraction of the corpus) — AQE broadcasts it when
  * small; singleton docs fall back to their own id, so their assignment
  * is identical to [[splitAssign]] with the same salt (tested). */
object Splits {

  /** Millionths-resolution cumulative thresholds for a fraction spec.
    * Requires: nonempty, positive fractions, distinct names, sum within
    * 1e-6 of 1, and every ROUNDED threshold strictly above its
    * predecessor — a fraction below ~5e-7 rounds to a zero-width
    * millionths band (and accumulated rounding can make thresholds
    * non-increasing), silently declaring a split no row can ever be
    * assigned; fail fast instead (ADVICE r13). The LAST split absorbs the
    * rounding remainder (its threshold is pinned to exactly 1e6). */
  private def cumMillionths(fracs: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(fracs.nonEmpty, "at least one split")
    require(fracs.forall(_._2 > 0), s"fractions must be positive: $fracs")
    require(fracs.map(_._1).distinct.size == fracs.size,
      s"split names must be distinct: ${fracs.map(_._1)}")
    require(math.abs(fracs.map(_._2).sum - 1.0) < 1e-6,
      s"fractions must sum to 1: ${fracs.map(_._2).sum}")
    val cums = fracs.scanLeft(0.0)(_ + _._2).tail
    val out = fracs.map(_._1).zip(cums.map(c => math.round(c * 1e6)))
      .init :+ (fracs.last._1 -> 1000000L)
    (0L +: out.map(_._2)).zip(out).foreach { case (prev, (name, cum)) =>
      require(cum > prev,
        s"split '$name' rounds to a zero-width millionths band " +
          s"(threshold $cum after $prev) — every split needs >= 1 millionth")
    }
    out
  }

  /** `h60(salt:key) mod 1e6` — the assignment bucket (h60 is 60-bit
    * nonnegative, so `%` needs no pmod). `concat`, not `concat_ws`: the
    * key must NULL-PROPAGATE so a NULL key yields a NULL bucket, every
    * CASE arm evaluates false, and both engines fall through to the last
    * split — `concat_ws` would silently hash just the salt on the Spark
    * side while the oracle's `||` propagates (ADVICE r13). Byte-identical
    * to the old rendering for non-NULL keys. */
  private def bucket(salt: String, key: Column): Column =
    h60(concat(lit(salt), lit("#"), key.cast("string"))) % 1000000L

  private def caseOver(b: Column, cums: Seq[(String, Long)]): Column =
    cums.init.foldRight(lit(cums.last._1)) { case ((name, cum), rest) =>
      when(b < cum, lit(name)).otherwise(rest)
    }

  /** Deterministic hash split over `keyCol` (default doc_id): zero-shuffle,
    * stable under corpus growth. Output `(doc_id, split)`. */
  def splitAssign(documents: DataFrame, fracs: Seq[(String, Double)],
      salt: String, keyCol: String = "doc_id"): DataFrame =
    documents.select(col("doc_id"),
      caseOver(bucket(salt, col(keyCol)), cumMillionths(fracs)).as("split"))

  /** DuckDB CASE expression assigning the split for SQL key expression
    * `key` — the single renderer every split_assign* oracle composes, so
    * the SQL thresholds can never drift from [[cumMillionths]]. */
  def splitCaseSql(fracs: Seq[(String, Double)], salt: String,
      key: String): String = {
    val b = s"(${h60Sql(s"'$salt' || '#' || CAST($key AS VARCHAR)")} % 1000000)"
    val cums = cumMillionths(fracs)
    // single-split spec: `CASE ELSE 'x' END` (no WHEN arm) is invalid
    // DuckDB while the Column-side caseOver degenerates fine — render the
    // bare literal so both engines accept the same spec (ADVICE r13)
    if (cums.size == 1) s"'${cums.last._1}'"
    else {
      val cases = cums.init.map { case (n, c) => s"WHEN $b < $c THEN '$n'" }
        .mkString(" ")
      s"CASE $cases ELSE '${cums.last._1}' END"
    }
  }

  /** DuckDB replay of [[splitAssign]] over table `t` (same integer
    * thresholds; `key` defaults to doc_id). */
  def splitAssignOracleSql(fracs: Seq[(String, Double)], salt: String,
      t: String = "documents", key: String = "doc_id"): String =
    s"""SELECT doc_id, ${splitCaseSql(fracs, salt, key)} AS split
       |FROM $t ORDER BY doc_id""".stripMargin

  /** Exact per-stratum quotas: docs rank within their stratum by
    * (h60(salt:doc), doc_id) and the integer rank test `rn · 1e6 ≤ cum ·
    * total` cuts each stratum at exact cumulative boundaries — every
    * stratum's split sizes differ from `frac · total` by less than 1.
    * Output `(doc_id, <strata...>, split)`. */
  def splitAssignStratified(documents: DataFrame,
      fracs: Seq[(String, Double)], salt: String,
      strata: Seq[String] = Seq("source", "lang")): DataFrame = {
    val cums = cumMillionths(fracs)
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(bucket(salt, col("doc_id")), col("doc_id"))
    val wAll = Window.partitionBy(strata.map(col): _*)
    val split = cums.init.foldRight(lit(cums.last._1)) {
      case ((name, cum), rest) =>
        when(col("rn") * 1000000L <= lit(cum) * col("total"), lit(name))
          .otherwise(rest)
    }
    documents
      .select((col("doc_id") +: strata.map(col)): _*)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("total", count(lit(1)).over(wAll))
      .select((col("doc_id") +: strata.map(col)) :+ split.as("split"): _*)
  }

  /** DuckDB replay of [[splitAssignStratified]]. */
  def splitAssignStratifiedOracleSql(fracs: Seq[(String, Double)],
      salt: String, strata: Seq[String] = Seq("source", "lang"),
      t: String = "documents"): String = {
    val b = s"(${h60Sql(s"'$salt' || '#' || CAST(doc_id AS VARCHAR)")} % 1000000)"
    val part = strata.mkString(", ")
    val cums = cumMillionths(fracs)
    val cases = cums.init
      .map { case (n, c) => s"WHEN rn * 1000000 <= $c * total THEN '$n'" }
      .mkString(" ")
    s"""WITH ranked AS (
       |  SELECT doc_id, $part,
       |    CAST(row_number() OVER (PARTITION BY $part ORDER BY $b, doc_id) AS BIGINT) AS rn,
       |    count(*) OVER (PARTITION BY $part) AS total
       |  FROM $t)
       |SELECT doc_id, $part, CASE $cases ELSE '${cums.last._1}' END AS split
       |FROM ranked ORDER BY doc_id""".stripMargin
  }

  /** Leakage-consistent split: every near-duplicate cluster lands in ONE
    * split. `clusterLabels` is [[Dedup.nearDupClusters]]' output
    * `(doc_id, cluster_rep)` — it holds only clustered docs; singletons
    * hash their own id (so their assignment equals [[splitAssign]] at the
    * same salt). Output `(doc_id, split_key, split)` — split_key exposes
    * the hashed identity for audits. */
  def splitAssignLeakFree(documents: DataFrame, clusterLabels: DataFrame,
      fracs: Seq[(String, Double)], salt: String): DataFrame = {
    val cums = cumMillionths(fracs)
    documents.select(col("doc_id"))
      .join(clusterLabels, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_rep"), col("doc_id")))
      .select(col("doc_id"), col("split_key"),
        caseOver(bucket(salt, col("split_key")), cums).as("split"))
  }
}
