package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7.4 / the 100-TB design notes): when one
  * key dominates, a plain shuffle sends the whole hot key to one task.
  * Salting splits it across `salt` subtasks — at the price of replicating
  * the small side (join) or adding a pre-aggregation level (groupBy).
  * AQE's skew-join handles many cases at runtime; these are the explicit
  * forms for when the skew is known and extreme.
  */
object Skew {

  /** Deterministic salt in [0, n): hash of `src` — any column with
    * spread (a unique id is ideal). Deterministic so retried tasks and
    * oracle comparisons see the same placement.
    */
  def saltOf(src: Column, n: Int): Column = pmod(hash(src), lit(n))

  /** Two-phase aggregation for a skewed groupBy key: partial-aggregate on
    * (key, salt), then final on key. For algebraic aggregates this is
    * exactly Spark's map-side partial aggregation made explicit with a
    * REDUCE-side split too — the hot key's rows land on `salt` tasks
    * instead of one.
    */
  def saltedSum(df: DataFrame, keyCol: String, valCol: String,
      saltSrc: String, salt: Int): DataFrame =
    df.withColumn("__salt", saltOf(col(saltSrc), salt))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(s"sum_$valCol"))

  /** Salted equi-join for a skewed fact key: the fact side gets a
    * deterministic salt, the (small) dim side is replicated across the
    * full salt domain, and the join key becomes (key, salt) — the hot
    * key's rows now hash to `salt` different reducers. Semantics are
    * identical to `fact.join(dim, key)` (asserted in the test suite).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSrc: String, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltOf(col(saltSrc), salt))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
