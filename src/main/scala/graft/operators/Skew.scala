package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §2.E2). AQE's skew-join split handles most
  * cases at runtime; explicit salting is for the pathological shape AQE
  * can't fix — one join key owning a double-digit percentage of a 100 TB
  * fact table, where a single post-split partition is still unboundedly
  * large.
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a (replicable) right
    * side. The fact rows spread across `salts` sub-keys; the right side is
    * replicated `salts`× (explode of a literal range — cheap for dim-scale
    * rights, the only kind worth salting against). The hot key's rows then
    * land on `salts` shuffle partitions instead of one, bounding the
    * largest task at |hot key| / salts.
    *
    * Result equals `fact.join(right, key, joinType)` row-for-row: the salt
    * column is internal and dropped.
    */
  def saltedJoin(fact: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting supports inner/left joins, not $joinType")
    val saltedFact = fact.withColumn("_graft_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedRight = right.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedRight, Seq(key, "_graft_salt"), joinType)
      .drop("_graft_salt")
  }
}
