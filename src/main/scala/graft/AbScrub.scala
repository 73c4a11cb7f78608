package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** THROWAWAY stage breakdown for the scrub_dup_spans sf10 row (verdict r17
  * #2 — at 10.10 s it is the largest committed sf10 row without a measured
  * stage split): where do the seconds go — the corpus tokenize fill, the
  * positional window fill, the dup-hash groupBy, covered-position build,
  * the affected-doc rewrite, or the untouched pass-through? And what does
  * the lake-artifact form buy — reading the full-corpus span-window SET
  * from an ingest-time artifact (the [[graft.streaming.EventStreams
  * .spanWindowStream]] sink shape) plus a compaction-view dup-hash table
  * (the [[graft.sources.FrameSketchLake]].classes posture, span edition),
  * so the serving row pays only affected-doc discovery + position recovery
  * + rewrite? Parity-checked against the current form before any timing is
  * trusted. Same protocol as [[AbFrameDupInc]]. */
object AbScrub {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master("local[32]")
      .appName("ab-scrub")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val window = Dedup.SpanWindow
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[ab-scrub] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- the serving row as committed (scrubDupSpans = Text + projection)
    (1 to 3).foreach { rep =>
      t(s"FULL scrub_dup_spans (rep $rep)") {
        noop(Dedup.scrubDupSpans(docs, window))
      }
      graft.CacheRegistry.release()
    }

    // ---- stage split of the CURRENT form (mirrors scrubDupSpansText)
    val toks = graft.CacheRegistry.persist(docs
      .select(col("doc_id"), explode(array(struct(tokens(col("text")).as("w")))).as("c"))
      .select(col("doc_id"), col("c.w").as("w")))
    t("stage: corpus tokenize fill") { noop(toks) }
    val winnable = toks.where(size(col("w")) >= window)
    val wins = graft.CacheRegistry.persist(
      winnable.select(col("doc_id"),
        posexplode(spanWindowHashes(col("w"), window)).as(Seq("i0", "wh")))
        .select(col("doc_id"), (col("i0") + 1).as("i"), col("wh")))
    t("stage: positional window fill") { noop(wins) }
    val dupHashes = wins.select(col("wh"), col("doc_id")).distinct()
      .groupBy(col("wh")).agg(count(lit(1)).as("nd"))
      .where(col("nd") > 1).select(col("wh"))
    t("stage: dup-hash groupBy") { noop(dupHashes) }
    val covered = graft.CacheRegistry.persist(
      wins.join(dupHashes, Seq("wh"), "left_semi")
        .select(col("doc_id"),
          explode(sequence(col("i"), col("i") + lit(window - 1))).as("pos"))
        .distinct())
    t("stage: covered-position fill") { noop(covered) }
    val affected = covered.select(col("doc_id")).distinct()
    var nAffected = 0L; var nDocs = 0L
    t("stage: affected-doc distinct") {
      nAffected = affected.count(); nDocs = docs.count()
    }
    println(s"[ab-scrub] affected docs: $nAffected of $nDocs")
    val rewritten = toks.join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), size(col("w")).as("n_tokens"),
        posexplode(col("w")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("n_tokens"), (col("p0") + 1).as("pos"), col("tok"))
      .join(covered.withColumn("cov", lit(1)), Seq("doc_id", "pos"), "left")
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(col("cov")).as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("cov").isNull,
            struct(col("pos"), col("tok"))))),
          s => s.getField("tok"))).as("t"))
    t("stage: affected rewrite") { noop(rewritten) }
    val untouched = toks.join(affected, Seq("doc_id"), "left_anti")
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), size(col("w")).as("n_tokens"),
        lit(0L).as("n_removed"), col("text"))
    t("stage: untouched pass-through") { noop(untouched) }
    graft.CacheRegistry.release()

    // ---- ALT: lake-artifact form. Refresh-time work: the full-corpus
    // span-window SET (what the ingest sink writes) + the compaction-view
    // dup-hash table. Serving work: affected discovery + position recovery
    // over affected docs only + rewrite + pass-through.
    val winArt = s"target/ab-scrub-spanset"
    val dupArt = s"target/ab-scrub-duphash"
    t("ALT refresh: span-set artifact") {
      Dedup.spanWindowSet(docs, window).write.mode("overwrite").parquet(winArt)
    }
    t("ALT refresh: dup-hash artifact") {
      spark.read.parquet(winArt)
        .groupBy(col("wh")).agg(count(lit(1)).as("nd"))
        .where(col("nd") > 1).select(col("wh"))
        .write.mode("overwrite").parquet(dupArt)
    }

    def altScrub(): DataFrame = {
      val spanSet = spark.read.parquet(winArt)
      val dupH = spark.read.parquet(dupArt)
      val aff = spanSet.join(dupH, Seq("wh"), "left_semi")
        .select(col("doc_id")).distinct()
      // position recovery: re-tokenize ONLY affected docs
      val toksAff = graft.CacheRegistry.persist(docs
        .join(aff, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), explode(array(struct(tokens(col("text")).as("w")))).as("c"))
        .select(col("doc_id"), col("c.w").as("w")))
      val winsAff = toksAff.where(size(col("w")) >= window)
        .select(col("doc_id"),
          posexplode(spanWindowHashes(col("w"), window)).as(Seq("i0", "wh")))
        .select(col("doc_id"), (col("i0") + 1).as("i"), col("wh"))
      val cov = graft.CacheRegistry.persist(
        winsAff.join(dupH, Seq("wh"), "left_semi")
          .select(col("doc_id"),
            explode(sequence(col("i"), col("i") + lit(window - 1))).as("pos"))
          .distinct())
      val rw = toksAff
        .select(col("doc_id"), size(col("w")).as("n_tokens"),
          posexplode(col("w")).as(Seq("p0", "tok")))
        .select(col("doc_id"), col("n_tokens"), (col("p0") + 1).as("pos"), col("tok"))
        .join(cov.withColumn("cov", lit(1)), Seq("doc_id", "pos"), "left")
        .groupBy(col("doc_id"), col("n_tokens"))
        .agg(count(col("cov")).as("n_removed"),
          concat_ws(" ", transform(
            array_sort(collect_list(when(col("cov").isNull,
              struct(col("pos"), col("tok"))))),
            s => s.getField("tok"))).as("t"))
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          col("t").as("text"))
      val un = docs.join(aff, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          size(tokens(col("text"))).as("n_tokens"),
          lit(0L).as("n_removed"), col("text"))
      rw.unionByName(un).select(
        col("doc_id"), col("n_tokens"), col("n_removed"),
        h60(col("text")).as("scrub_h60"), length(col("text")).as("n_scrub_chars"))
    }

    (1 to 3).foreach { rep =>
      t(s"ALT scrub via artifacts (rep $rep)") { noop(altScrub()) }
      graft.CacheRegistry.release()
    }

    // ---- parity: the ALT form must be row-identical to the current form
    t("parity check (full vs ALT)") {
      def sig(df: DataFrame) = df.agg(
        count(lit(1)).as("n"),
        sum(col("n_tokens")).as("st"), sum(col("n_removed")).as("sr"),
        sum(col("scrub_h60") % 1000003L).as("sh"),
        sum(col("n_scrub_chars")).as("sc")).collect()(0).toSeq
      val a = sig(Dedup.scrubDupSpans(docs, window))
      graft.CacheRegistry.release()
      val b = sig(altScrub())
      graft.CacheRegistry.release()
      println(s"[ab-scrub] parity: current=$a alt=$b match=${a == b}")
      assert(a == b, "ALT form diverged from the committed form")
    }
    spark.stop()
  }
}
