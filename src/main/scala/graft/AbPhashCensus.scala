package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY census for the `near_dup_frames` sf10 floor (verdict r15 #6):
  * measures the banded-join candidate work Σ pop² over class buckets for
  *
  *   A. the current scheme — 4 × 16-bit joint bands, key (lang, band, bv);
  *   B. recursive sub-banding — within each band's bucket the remaining
  *      48 joint bits split into 4 × 12-bit sub-bands, key
  *      (lang, band, bv, sub, sbv). Pigeonhole exactness survives the
  *      recursion: joint distance ≤ 3 < 4 forces a clean band, and within
  *      that band's bucket the ≤ 3 dirty bits live in the 48-bit
  *      complement, so among its 4 sub-bands one is again clean.
  *
  * Decision input only: if Σ pop² (B) ≪ Σ pop² (A) at sf10, implement B in
  * [[graft.multimodal.Multimodal]]; if the dense ball's variation sits
  * inside one sub-band (B ≈ 3/4 · A), the floor is real — record it. */
object AbPhashCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master("local[32]")
      .appName("ab-phash-census")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val classes = graft.CacheRegistry.persist(
      graft.multimodal.Multimodal.phashFrames(docs, carry = Seq("lang"))
        .groupBy(col("lang"), col("ahash"), col("dhash")).agg(count(lit(1)).as("n")))
    println(s"[census] classes: ${classes.count()}")

    // A: 4 x 16-bit joint bands (cells = 32 -> loW = 16)
    val loW = 16
    val loMask = lit((1L << loW) - 1L)
    val bands = Seq(
      struct(lit(0).as("band"), col("ahash").bitwiseAND(loMask).as("bv")),
      struct(lit(1).as("band"), shiftright(col("ahash"), loW).as("bv")),
      struct(lit(2).as("band"), col("dhash").bitwiseAND(loMask).as("bv")),
      struct(lit(3).as("band"), shiftright(col("dhash"), loW).as("bv")))
    val banded = classes.select(col("lang"), col("ahash"), col("dhash"),
      explode(array(bands: _*)).as("bb"))
    val a = banded.groupBy(col("lang"), col("bb.band"), col("bb.bv"))
      .agg(count(lit(1)).as("pop"))
      .agg(sum(col("pop") * col("pop")).as("sum_pop2"), max(col("pop")).as("max_pop"),
        count(lit(1)).as("n_buckets"))
      .head()
    println(s"[census] A (band,bv): sum_pop2=${a.get(0)} max_pop=${a.get(1)} buckets=${a.get(2)}")

    // B: complement 48 bits as 4 x 12-bit sub-bands. Complement of band k =
    // the 64-bit joint sketch minus band k's 16 bits; build it per band via
    // bit surgery on (ahash, dhash) as a single 48-bit long, then split.
    val joint = shiftleft(col("ahash"), 32).bitwiseOR(col("dhash").bitwiseAND(lit(0xFFFFFFFFL)))
    def complement(band: Int) = {
      // joint layout: [ahash hi 16][ahash lo 16][dhash hi 16][dhash lo 16]
      // bands:            1            0            3            2
      val shiftOf = Map(1 -> 48, 0 -> 32, 3 -> 16, 2 -> 0)
      val keep = (0 to 3).filter(_ != band).sortBy(b => -shiftOf(b))
      // concatenate the three remaining 16-bit fields into a 48-bit value
      keep.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(joint, shiftOf(b)).bitwiseAND(lit(0xFFFFL)),
          (2 - i) * 16)
      }.reduce(_ bitwiseOR _)
    }
    val subW = 12
    val subMask = lit((1L << subW) - 1L)
    val subRows = (0 to 3).flatMap { band =>
      (0 to 3).map { sub =>
        struct(lit(band).as("band"), lit(sub).as("sub"),
          (if (band == 0) col("ahash").bitwiseAND(loMask)
           else if (band == 1) shiftright(col("ahash"), loW)
           else if (band == 2) col("dhash").bitwiseAND(loMask)
           else shiftright(col("dhash"), loW)).as("bv"),
          shiftright(complement(band), sub * subW).bitwiseAND(subMask).as("sbv"))
      }
    }
    val sub = classes.select(col("lang"), col("ahash"), col("dhash"),
      explode(array(subRows: _*)).as("bb"))
    val b = sub.groupBy(col("lang"), col("bb.band"), col("bb.bv"),
        col("bb.sub"), col("bb.sbv"))
      .agg(count(lit(1)).as("pop"))
      .agg(sum(col("pop") * col("pop")).as("sum_pop2"), max(col("pop")).as("max_pop"),
        count(lit(1)).as("n_buckets"))
      .head()
    println(s"[census] B (band,bv,sub,sbv): sum_pop2=${b.get(0)} max_pop=${b.get(1)} buckets=${b.get(2)}")

    // C: the solo-probe split — a probe class with n_docs >= 2 matches
    // ITSELF at distance 0, so any_multi = 1 with NO join; only solo
    // (n_docs == 1) probe classes need candidate generation. Work becomes
    // sum over buckets of popSolo * popAll instead of popAll^2.
    val cls2 = graft.CacheRegistry.persist(
      graft.multimodal.Multimodal.phashFrames(docs, carry = Seq("lang"))
        .groupBy(col("lang"), col("ahash"), col("dhash"))
        .agg(countDistinct(col("doc_id")).as("n_docs")))
    println(s"[census] multi classes: ${cls2.where(col("n_docs") > 1).count()} " +
      s"of ${cls2.count()}")
    val banded2 = cls2.select(col("lang"),
        (col("n_docs") === 1).cast("long").as("is_solo"),
        explode(array(bands: _*)).as("bb"))
    val c = banded2.groupBy(col("lang"), col("bb.band"), col("bb.bv"))
      .agg(count(lit(1)).as("pop"), sum(col("is_solo")).as("solo_pop"))
      .agg(sum(col("solo_pop") * col("pop")).as("solo_work"),
        max(col("solo_pop")).as("max_solo_pop"))
      .head()
    println(s"[census] C solo-probe work sum(solo_pop*pop)=${c.get(0)} " +
      s"max_solo_pop=${c.get(1)}")

    // D: B x C combined — sub-banded buckets, solo probes only
    val sub2 = cls2.select(col("lang"),
      (col("n_docs") === 1).cast("long").as("is_solo"),
      explode(array(subRows: _*)).as("bb"))
    val dRow = sub2.groupBy(col("lang"), col("bb.band"), col("bb.bv"),
        col("bb.sub"), col("bb.sbv"))
      .agg(count(lit(1)).as("pop"), sum(col("is_solo")).as("solo_pop"))
      .agg(sum(col("solo_pop") * col("pop")).as("solo_work"),
        max(col("solo_pop")).as("max_solo_pop"))
      .head()
    println(s"[census] D sub-banded solo work=${dRow.get(0)} " +
      s"max_solo_pop=${dRow.get(1)}")

    // E: the solo-arm split — solo x solo (full enumeration, min/max) vs
    // solo x multi (EXISTS — a left-semi join can early-out per probe row)
    val e = banded2.groupBy(col("lang"), col("bb.band"), col("bb.bv"))
      .agg(count(lit(1)).as("pop"), sum(col("is_solo")).as("solo_pop"))
      .agg(sum(col("solo_pop") * col("solo_pop")).as("solo_solo"),
        sum(col("solo_pop") * (col("pop") - col("solo_pop"))).as("solo_multi"))
      .head()
    println(s"[census] E solo_solo=${e.get(0)} solo_multi=${e.get(1)}")

    // F: sub-banded solo x solo (the only full-enumeration arm left)
    val f = sub2.groupBy(col("lang"), col("bb.band"), col("bb.bv"),
        col("bb.sub"), col("bb.sbv"))
      .agg(sum(col("is_solo")).as("solo_pop"))
      .agg(sum(col("solo_pop") * col("solo_pop")).as("solo_solo_sub"))
      .head()
    println(s"[census] F sub-banded solo_solo=${f.get(0)}")
    graft.CacheRegistry.release()
    spark.stop()
  }
}
