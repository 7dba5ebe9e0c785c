package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script profiling — the multilingual-corpus curation signal
  * that language-ID heuristics ([[TextAnalysis.langId]]) sit on top of:
  * per-document codepoint counts by script block (Latin, Cyrillic,
  * Greek, CJK, digits), the dominant script, and the MIXED-SCRIPT WORD
  * flag (a Latin letter directly adjacent to a Cyrillic one — the
  * classic confusable-spoof / mojibake signature that plain language ID
  * misses because the document still "looks" like its majority script).
  *
  * All metrics are codepoint counts via class-removal regex
  * (`length(p) - length(regexp_replace(p, class, ''))`) over BMP
  * ranges, so Spark (Java regex) and DuckDB (RE2) agree literally and
  * the rollup is hash-exact. One narrow codegen'd projection per doc —
  * no shuffle until the (source, script)-sized rollup.
  *
  * Non-BMP input: Spark's `length()` counts CODEPOINTS (it is
  * `UTF8String.numChars`, which walks UTF-8 lead bytes — NOT UTF-16
  * code units), the same contract as a codepoint-native engine's
  * `length()`, so a supplementary-plane character (emoji, CJK ext-B)
  * lands in `other_cp` as exactly one codepoint in both engines — no
  * BMP-only precondition (ScriptMixSpec proves it on astral input).
  */
object ScriptMix {

  private def cpCount(p: Column, cls: String): Column =
    (length(p) - length(regexp_replace(p, cls, ""))).cast("long")

  /** Per-doc script profile of `textCol`: codepoint counts per class,
    * `dominant` script (ties resolved latin > cyrillic > greek > cjk,
    * 'none' when no letter codepoints), and `mixed` (true iff any
    * Latin↔Cyrillic adjacency exists). */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val p = col(textCol)
    docs
      .withColumn("latin_cp", cpCount(p, "[A-Za-z]"))
      .withColumn("cyr_cp", cpCount(p, "[Ѐ-ӿ]"))
      .withColumn("greek_cp", cpCount(p, "[Ͱ-Ͽ]"))
      .withColumn("cjk_cp", cpCount(p, "[一-鿿]"))
      .withColumn("digit_cp", cpCount(p, "[0-9]"))
      .withColumn("other_cp",
        length(p).cast("long") - col("latin_cp") - col("cyr_cp")
          - col("greek_cp") - col("cjk_cp") - col("digit_cp"))
      .withColumn("mixed",
        p.rlike("[A-Za-z][Ѐ-ӿ]|[Ѐ-ӿ][A-Za-z]"))
      .withColumn("dominant",
        when(col("latin_cp") >= col("cyr_cp")
          && col("latin_cp") >= col("greek_cp")
          && col("latin_cp") >= col("cjk_cp")
          && col("latin_cp") > 0, "latin")
        .when(col("cyr_cp") >= col("greek_cp")
          && col("cyr_cp") >= col("cjk_cp")
          && col("cyr_cp") > 0, "cyrillic")
        .when(col("greek_cp") >= col("cjk_cp")
          && col("greek_cp") > 0, "greek")
        .when(col("cjk_cp") > 0, "cjk")
        .otherwise("none"))
  }

  /** (source, dominant script) rollup of [[profile]]: doc and
    * mixed-script-doc counts plus summed per-class codepoints. */
  def rollup(
      docs: DataFrame,
      idCol: String,
      srcCol: String,
      textCol: String): DataFrame =
    profile(docs, idCol, textCol)
      .groupBy(col(srcCol).as("source"), col("dominant").as("script"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("mixed"), 1L).otherwise(0L)).as("n_mixed"),
        sum(col("latin_cp")).as("latin_cp"),
        sum(col("cyr_cp")).as("cyr_cp"),
        sum(col("greek_cp")).as("greek_cp"),
        sum(col("cjk_cp")).as("cjk_cp"),
        sum(col("digit_cp")).as("digit_cp"),
        sum(col("other_cp")).as("other_cp"))
}
