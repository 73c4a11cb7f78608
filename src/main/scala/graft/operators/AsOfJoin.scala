package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right timestamp at or before
  * the left row's timestamp, per key. Spark has no native ASOF JOIN (DuckDB
  * does — it is the oracle for this operator); the naive formulation is a
  * range join (`r.t <= l.t` + max-per-left) whose pre-filter product is
  * O(|L|·|R|) per key.
  *
  * This implementation is the union+window formulation: tag both sides, union,
  * and carry the last right-side timestamp forward with a running
  * `last(_, ignoreNulls)` window. Cost: ONE hash shuffle on `key` plus an
  * in-partition sort — linear in |L|+|R|, never materializing the product, and
  * skew-safe under AQE like any other window. At 100 TB this is the only
  * formulation that survives: the range-join product on a hot key does not.
  *
  * Tie semantics: a right row at exactly `lTime` IS visible to the left row
  * (ASOF `<=`), encoded by sorting right rows (`_kind` 0) before left rows
  * (`_kind` 1) at equal timestamps. Right side must be unique per
  * `(key, rTime)` — pre-aggregate it otherwise (the query layer does a
  * `.distinct()`), matching DuckDB's requirement for deterministic ASOF output.
  */
object AsOfJoin {

  /** Attach `asOfCol` = greatest right `rTime` with `rTime <= lTime` for the
    * same `key` (null if no such row). `right` needs only (`key`, `rTime`);
    * all left columns pass through unchanged. Timestamps are compared as LONG
    * (epoch seconds by the engine's export convention).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           lTime: String, rTime: String, asOfCol: String): DataFrame = {
    val l = left
      .withColumn("_t", col(lTime).cast("long"))
      .withColumn("_kind", lit(1))
    val r = right
      .select(col(key), col(rTime).cast("long").as("_t"))
      .withColumn("_kind", lit(0))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asOfCol,
        last(when(col("_kind") === 0, col("_t")), ignoreNulls = true).over(w))
      .where(col("_kind") === 1)
      .drop("_kind", "_t")
  }

  /** Forward as-of: `asOfCol` = smallest right `rTime` with `rTime >= lTime`
    * for the same `key` (null if none follows). Same union+one-window shape
    * as [[asOf]], scanned with a forward frame; a right row at exactly
    * `lTime` IS visible (ASOF `>=`), encoded by sorting left rows (`_kind` 0)
    * before right rows (`_kind` 1) at equal timestamps so the left row's
    * forward frame includes it. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  lTime: String, rTime: String, asOfCol: String): DataFrame = {
    val l = left
      .withColumn("_t", col(lTime).cast("long"))
      .withColumn("_kind", lit(0))
    val r = right
      .select(col(key), col(rTime).cast("long").as("_t"))
      .withColumn("_kind", lit(1))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_kind").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asOfCol,
        first(when(col("_kind") === 1, col("_t")), ignoreNulls = true).over(w))
      .where(col("_kind") === 0)
      .drop("_kind", "_t")
  }
}
