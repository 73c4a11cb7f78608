package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** The composed end-to-end curation pipeline a training-data team runs —
  * every stage is an individually-oracled operator, chained in the canonical
  * order so each stage shrinks the data the next one touches:
  *
  *   1. quality filter      ([[TextAnalysis.corpusFilter]] keep rules)
  *   2. exact dedup         ([[Dedup.exact]] md5 keep-min)
  *   3. near-dup survivors  ([[Dedup.ngramJaccardPairs]] + keep-min anti-join)
  *   4. PII audit           ([[TextAnalysis.piiScrub]] match counts)
  *   5. split assignment    ([[TextAnalysis.trainValTestSplit]])
  *
  * Output is the narrow curated manifest `(doc_id, lang, n_chars, n_emails,
  * n_ips, n_phones, split)` — the text itself ships via
  * [[graft.GraftEngine.exportCorpus]], partitioned by split. Order matters
  * for cost, not correctness: dedup runs on the quality-passed subset (near
  * -dup candidate generation is the expensive stage; the filter typically
  * drops the garbage docs that generate degenerate shingle buckets), and
  * near-dup pairs are computed WITHIN the exact-deduped set (pairs against
  * an exact-dup loser would re-drop already-dropped docs).
  *
  * Scale: inherits each stage's posture — blocked/bucketed candidate
  * generation, scan-speed projections, hash-keyed shuffles. The doc_id
  * membership joins between stages are AQE-broadcastable id lists.
  */
object CorpusPipeline {

  def curate(documents: DataFrame, minJaccard: Double = 0.5): DataFrame =
    curateFromPairs(documents, Dedup.ngramJaccardPairs(documents, minJaccard))

  /** [[curate]] over a PRECOMPUTED verified-pair table (verdict r15 #4 —
    * the pair table is declared "written once per corpus version" in the
    * scaladoc below; [[graft.sources.VerifiedPairs]] makes that literal, so
    * the pipeline's near-dup stage is two id semi-joins over a parquet
    * scan, with the candidate join paid at artifact-refresh time). */
  def curateFromPairs(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val kept = TextAnalysis.corpusFilter(documents)
      .where(col("keep")).select(col("doc_id"))
    val quality = documents.join(kept, Seq("doc_id"))
    val exactKeep = Dedup.exact(quality)
      .select(col("keep_doc_id").as("doc_id"))
    // persist the two stage outputs that fan out (registry-tracked,
    // released at the family boundary): exactDeduped feeds BOTH the
    // near-dup id semi-join and the anti-join, survivors feeds THREE final
    // branches (manifest, PII audit, split). Without materialization each
    // reference re-expands the entire upstream tree — a production pipeline
    // writes each stage to the lake (write-then-read); persist is the
    // in-session equivalent (same posture as Dedup.lshCandidatePairs).
    val exactDeduped =
      graft.CacheRegistry.persist(quality.join(exactKeep, Seq("doc_id")))
    // near-dup pairs by POST-FILTERING the corpus-level verified pair table
    // (r15; was ngramJaccardPairsAmong's restricted prefix join): shingles
    // are per-doc, so pairs-among-ids ≡ pairs-of-everything with both
    // endpoints in ids, at unchanged Jaccard (the Among scaladoc's
    // argument). The pair table is the pipeline's SHARED artifact — the
    // same materialization survivor selection, clustering, and the split
    // producers consume (in-session: one CacheRegistry entry; in
    // production: a lake table written once per corpus version) — so the
    // curation stage reads it for the cost of two id semi-joins instead of
    // running a second candidate join over an 80-90% overlapping doc set.
    val ids = exactDeduped.select(col("doc_id"))
    val dropped = pairs
      .join(ids.toDF("doc_a"), Seq("doc_a"), "left_semi")
      .join(ids.toDF("doc_b"), Seq("doc_b"), "left_semi")
      .select(col("doc_b").as("doc_id")).distinct()
    val survivors = graft.CacheRegistry.persist(
      exactDeduped.join(dropped, Seq("doc_id"), "left_anti"))
    // The three final branches (manifest columns, PII audit, split
    // assignment) are all PER-ROW projections of the same survivors frame —
    // the r19 optimization round collapses the two doc_id re-join branches
    // into one join-free projection (two joins + their exchanges gone;
    // value-identical: the joins were 1:1 on a unique key and every joined
    // column is a deterministic function of the survivor row). The PII
    // struct fans out behind the usual Generate barrier so the one-pass
    // matcher kernel runs once per row, not once per referenced field.
    val staged = survivors.select(
      col("doc_id"), col("lang"), col("n_chars"),
      explode(array(
        graft.functions.GraftFunctions.piiScrubSeq(col("text")))).as("c"))
    staged.select(
      col("doc_id"), col("lang"), col("n_chars"),
      col("c.n_emails").cast("int").as("n_emails"),
      col("c.n_ips").cast("int").as("n_ips"),
      col("c.n_phones").cast("int").as("n_phones"),
      TextAnalysis.splitFor(col("doc_id")).as("split"))
  }

  /** DuckDB oracle: the same five stages as CTEs, reusing each stage's
    * oracled fragments (corpus-filter thresholds, md5 keep-min, lang-blocked
    * shingle-postings Jaccard, PII regexes, salted split hash). */
  def curateOracleSql(table: String, minJaccard: Double): String = {
    val w = "string_split(text, ' ')"
    val sh = shingles3Sql("w")
    val splitHash =
      h60Sql(s"('${TextAnalysis.SplitSalt}#' || CAST(doc_id AS VARCHAR))")
    val (em, ip, ph) =
      (TextAnalysis.EmailRegex, TextAnalysis.Ipv4Regex, TextAnalysis.PhoneRegex)
    s"""WITH tok AS (SELECT doc_id, unnest($w) AS t FROM $table),
       |tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       |top AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    MAX(c) AS max_c FROM tf GROUP BY doc_id),
       |pr AS (SELECT doc_id,
       |    round(CAST(len(list_distinct($w)) AS DOUBLE) / len($w), 6) AS uniq_ratio
       |  FROM $table),
       |keepq AS (SELECT top.doc_id FROM top JOIN pr ON pr.doc_id = top.doc_id
       |  WHERE (CASE
       |    WHEN n_tokens < ${TextAnalysis.MinTokens} THEN 'too_short'
       |    WHEN round(CAST(max_c AS DOUBLE) / n_tokens, 6) >
       |      ${TextAnalysis.MaxTopTokRatio} THEN 'repeated_token'
       |    WHEN uniq_ratio < ${TextAnalysis.MinUniqRatio} THEN 'low_diversity'
       |  END) IS NULL),
       |q AS (SELECT d.* FROM $table d JOIN keepq USING (doc_id)),
       |ek AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
       |e AS (SELECT q.* FROM q JOIN ek USING (doc_id)),
       |d2 AS (SELECT doc_id, lang, $w AS w FROM e),
       |ds AS (SELECT doc_id, lang, $sh AS sh FROM d2),
       |dsz AS (SELECT doc_id, len(sh) AS n FROM ds WHERE len(sh) > 0),
       |p AS (SELECT doc_id, lang, unnest(sh) AS s FROM ds WHERE len(sh) > 0),
       |c AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
       |  FROM p a JOIN p b ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |dropped AS (SELECT DISTINCT db AS doc_id
       |  FROM c JOIN dsz sa ON sa.doc_id = da JOIN dsz sb ON sb.doc_id = db
       |  WHERE round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) >= $minJaccard),
       |s AS (SELECT e.* FROM e
       |  WHERE NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = e.doc_id)),
       |pii AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '$em')) AS INT) AS n_emails,
       |    CAST(len(regexp_extract_all(text, '$ip')) AS INT) AS n_ips,
       |    CAST(len(regexp_extract_all(text, '$ph')) AS INT) AS n_phones
       |  FROM s),
       |sp AS (SELECT doc_id,
       |    CASE WHEN $splitHash % 100 < 80 THEN 'train'
       |         WHEN $splitHash % 100 < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM s)
       |SELECT s.doc_id, s.lang, s.n_chars,
       |  pii.n_emails, pii.n_ips, pii.n_phones, sp.split
       |FROM s JOIN pii USING (doc_id) JOIN sp USING (doc_id)
       |ORDER BY s.doc_id""".stripMargin
  }
}
