package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A straight `groupBy(key)` over a skewed key (one dealer code owning
  * half the rows — exactly the reference's default-dealer '9967' pattern)
  * funnels the hot key through one reducer. Salting splits each key into
  * `salts` sub-groups for the partial phase, then combines partials —
  * same result, hot key spread over `salts` reducers. AQE's skew-join
  * handling covers joins; this covers aggregations.
  */
object SkewOps {

  /** count + sum per key via a salted partial phase. `spreader` is any
    * column that distributes rows across salts (a row id keeps it
    * deterministic); the final result is independent of the salt
    * assignment because phase 2 re-combines partials (counts and
    * decimal sums are order-insensitive). */
  def saltedAgg(df: DataFrame, key: Column, sumCol: Column, salts: Int,
      spreader: Column, keyName: String, countName: String,
      sumName: String): DataFrame =
    df.withColumn("__salt", pmod(hash(spreader), lit(salts)))
      .groupBy(key.as(keyName), col("__salt"))
      .agg(count(lit(1)).as("__pc"), sum(sumCol).as("__ps"))
      .groupBy(col(keyName))
      .agg(sum(col("__pc")).as(countName), sum(col("__ps")).as(sumName))

  /** Skew-safe equi join: the fact side gets a salt from a spreader
    * column; the dim side is replicated once per salt value (explode of a
    * literal range — dim is small, replication is cheap); the join key
    * becomes (key, salt), so a hot key's rows spread over `salts`
    * reducers instead of one. Semantically identical to the plain join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int, spreader: Column,
      joinType: String = "left"): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(spreader), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("__salt") === replicatedDim("__salt"),
        joinType)
      .drop("__salt")
  }
}
