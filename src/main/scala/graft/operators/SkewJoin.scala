package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salt-based skew-join — the explicit form of the technique AQE's skew-join
  * splitting applies adaptively (`spark.sql.adaptive.skewJoin`): when one join
  * key carries a disproportionate share of the fact side (a hot document hash,
  * a celebrity user id), a plain shuffle sends the whole hot key to ONE task.
  * Salting splits it: the skewed (big) side gets a random-but-deterministic
  * salt in [0, S), the small side is replicated S× with every salt value, and
  * the join key becomes (key, salt) — the hot key now spreads across S tasks.
  *
  * Use when AQE is unavailable (streaming joins, non-adaptive deployments) or
  * when the skew is known ahead of time and the S× replication of the
  * build side is cheaper than a runtime re-plan. The salt is a deterministic
  * hash of the whole row (not rand()): repeatable runs, no RNG state.
  */
object SkewJoin {

  /** Inner-join `big` (skewed side) to `small` on `key`, spreading each hot
    * key across `salts` tasks. `small` is replicated `salts`× — keep it the
    * dimension side. Result columns = big.* then small.* minus the join key
    * (same as a plain `join(small, key)`). */
  def saltedInner(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // deterministic per-row salt: portable hash of all big-side columns
    val saltCol = pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts))
    val b = big.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt count for a measured hot factor ([[graft.streaming.EventStreams
    * .hotKeyStream]]'s `hot_factor` = hottest key's row count ÷ mean rows
    * per key): spreading the hottest key across `ceil(hot_factor)` tasks
    * brings its per-task share down to ~the mean key's — the point where
    * more salts only pay replication cost. Uniform data (factor ≈ 1) gets 1
    * salt, i.e. the plain join. `maxSalts` caps the small side's
    * replication factor (default 32 = one salt per local[32] slot; size it
    * to cluster parallelism). */
  def saltsForHotFactor(hotFactor: Double, maxSalts: Int = 32): Int = {
    require(maxSalts >= 1, s"maxSalts must be >= 1, got $maxSalts")
    if (hotFactor.isNaN || hotFactor <= 1.0) 1
    else math.min(maxSalts, math.ceil(hotFactor - 1e-9).toInt)
  }

  /** The hotKeyStream → salted-join closed loop (verdict r8 #7): read the
    * LATEST window's row of a [[graft.streaming.EventStreams.hotKeyStream]]
    * report (any frame with `window_start` + `hot_factor` — the streaming
    * sink's accumulated table or its batch twin) and convert it into the
    * salt decision for the NEXT [[saltedInner]] run. One-row bounded
    * collect; an empty report (no windows closed yet) or a null
    * `hot_factor` (hand-built / partially-written report row) means no
    * skew evidence → 1 salt. This is the monitor made actionable: the
    * previous window measures, the next join spreads. */
  def saltsFromReport(report: DataFrame, maxSalts: Int = 32): Int = {
    val last = report
      .orderBy(col("window_start").desc).limit(1)
      .select(col("hot_factor")).collect()
    if (last.isEmpty || last.head.isNullAt(0)) 1
    else saltsForHotFactor(last.head.getDouble(0), maxSalts)
  }

  /** [[saltedInner]] at the salt count the skew report prescribes —
    * `saltedInner(big, small, key, saltsFromReport(report))`. */
  def reportSaltedInner(big: DataFrame, small: DataFrame, key: String,
      report: DataFrame, maxSalts: Int = 32): DataFrame =
    saltedInner(big, small, key, saltsFromReport(report, maxSalts))
}
