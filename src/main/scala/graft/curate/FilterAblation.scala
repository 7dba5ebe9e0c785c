package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-rule ablation matrix for a composite keep/drop filter — the
  * filter-design diagnostic every pretraining pipeline reports next to
  * its dataset card: for each rule, how many documents it flags at all,
  * how many drops are ATTRIBUTED to it under first-failing-rule
  * precedence (what a q46-style decision column shows), and how many
  * docs it drops ALONE (the marginal documents regained if just this
  * rule were removed — the rule's true cost, invisible in attribution
  * counts because precedence hides overlap).
  *
  * Scale shape: the rule flags are narrow per-row expressions; ONE
  * corpus aggregate computes all 3·|rules| sums map-side-combinably
  * into a single row, which a `stack` unpivots to the |rules|-row
  * matrix — no per-rule corpus pass, no row fan-out, nothing but
  * metadata past the aggregate. Exact integer counts → hash-exact on
  * any engine.
  */
object FilterAblation {

  /** `rules` are (name, fails-predicate) in PRECEDENCE order — the same
    * order the composite filter's decision column uses, so
    * `n_attributed` reconciles with its per-reason counts. Output: one
    * row per rule — `rule`, `n_flagged`, `n_attributed` (fails and no
    * earlier rule fails), `n_solo` (the ONLY failing rule). */
  def ablate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "ablate: at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "ablate: rule names must be unique")
    val flags = df.select(rules.map { case (n, c) =>
      c.cast("int").as(s"_f_$n")
    }: _*)
    val nFail = rules.map { case (n, _) => col(s"_f_$n") }.reduce(_ + _)
    val aggs = rules.zipWithIndex.flatMap { case ((n, _), i) =>
      val earlier = rules.take(i).map { case (e, _) => col(s"_f_$e") }
      val firstFail =
        if (earlier.isEmpty) col(s"_f_$n") === 1
        else col(s"_f_$n") === 1 && earlier.reduce(_ + _) === 0
      Seq(
        sum(col(s"_f_$n")).cast("long").as(s"_flagged_$n"),
        sum(when(firstFail, 1L).otherwise(0L)).cast("long").as(s"_attr_$n"),
        sum(when(col(s"_f_$n") === 1 && nFail === 1, 1L).otherwise(0L))
          .cast("long").as(s"_solo_$n"))
    }
    val one = flags.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (n, _) =>
      s"'$n', _flagged_$n, _attr_$n, _solo_$n"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, n_flagged, n_attributed, n_solo)")
  }
}
