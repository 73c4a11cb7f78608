package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the shuffle-elimination lever for repeated joins
  * at 100 TB: write both fact tables bucketed (and sorted) by their join
  * key, and every subsequent equi-join on that key co-locates bucket-to-
  * bucket with NO exchange on either side (and no sort when `sortBy`
  * matches). One shuffle paid once at write time replaces a shuffle per
  * join per query forever after — the difference between a nightly
  * pipeline that re-shuffles 100 TB per stage and one that streams
  * bucket-aligned files.
  *
  * Spark requires bucketed data to live in the catalog (`saveAsTable`);
  * the bucket count must match on both sides for the co-located plan.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans shuffle-free when
    * both were written with [[writeBucketed]] and equal bucket counts. When
    * the two key names coincide the join uses USING semantics (ONE key
    * column in the output) — the expression form would return two
    * same-named columns and make any downstream `select(key)` ambiguous
    * (ADVICE r4). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    if (leftKey == rightKey) l.join(r, Seq(leftKey))
    else l.join(r, l(leftKey) === r(rightKey))
  }
}
