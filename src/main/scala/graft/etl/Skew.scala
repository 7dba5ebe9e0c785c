package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join handling re-splits oversized sort-merge partitions at
  * runtime and is the first line of defense; explicit salting remains
  * for cases AQE cannot touch — deterministic layouts feeding bucketed
  * sinks, or a hot key so large that even a split partition's build side
  * won't fit. */
object Skew {

  /** Salted equi-join of a skewed fact to a dimension: every fact row
    * gets a deterministic salt in [0, salts) derived from its full row
    * content, and the dim side is replicated once per salt — a hot key's
    * rows spread over `salts` reducers instead of one. Cost is `salts`×
    * the (small) dim side.
    *
    * Only fact-preserving join types are allowed (inner, left_outer,
    * left_semi, left_anti): each fact row meets exactly its own salt's
    * dim replica, so semantics match the plain equi-join. Right/full
    * outer would emit every unmatched dim row once PER SALT — refused
    * rather than silently wrong.
    */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left_outer", "left", "left_semi", "leftsemi",
      "left_anti", "leftanti", "leftouter", "semi", "anti")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")) ||
        allowed.contains(joinType.toLowerCase),
      s"saltedEquiJoin supports fact-preserving join types only " +
        s"(inner/left_outer/left_semi/left_anti), got '$joinType': " +
        "right/full outer would replicate unmatched dim rows per salt")
    val saltExpr: Column =
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts))
    val saltedFact = fact.withColumn("_salt", saltExpr)
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedFact
      .join(saltedDim, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
