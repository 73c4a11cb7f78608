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
}
