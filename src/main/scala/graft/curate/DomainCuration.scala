package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation — the RefinedWeb-style stage between raw
  * crawl and text filtering: group documents by REGISTRABLE domain,
  * drop blocklisted domains, and cap each domain's contribution so a
  * single template-heavy site cannot dominate the corpus mixture.
  *
  * Reference scope note: the reference warehouse has no crawl stage;
  * this is LLM-pipeline extension surface, sibling to the q84
  * deterministic fixed-k sampling it reuses.
  *
  * Registrable-domain extraction is a DECLARED APPROXIMATION of the
  * Public Suffix List: the host's last two labels, or last three when
  * the last two are one of a fixed set of common multi-part suffixes
  * (`co.uk`-style). A full PSL lookup is a broadcast-joinable table a
  * deployment can substitute; the approximation keeps the operator
  * dependency-free and the oracle portable. Ports and userinfo in the
  * authority are NOT stripped (training-data URLs virtually never
  * carry them; a caller with such URLs normalizes first).
  *
  * Scale shape: domain extraction is a narrow codegen'd projection;
  * the blocklist is a broadcast anti-join (blocklists are metadata);
  * the per-domain cap is [[Curation.sampleFixedK]]'s two-phase
  * deterministic-hash top-k — rank inside 256 hash-prefix buckets
  * first, so no domain (however hot) funnels through one task. All
  * shuffles key on the domain; nothing is corpus-quadratic.
  */
object DomainCuration {

  /** Common multi-part public suffixes recognized by the default
    * [[registrableDomain]] (the PSL approximation, declared). */
  val DefaultMultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "co.in", "co.nz", "co.za", "co.kr",
    "com.br", "com.mx", "com.sg", "com.cn", "com.tr")

  /** The authority (host) part of a URL — everything between `://` and
    * the first `/`, `?` or `#`. */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)

  /** Registrable domain of a URL under the fixed multi-part-suffix
    * approximation: last two host labels, or last three when the last
    * two form a listed multi-part suffix; hosts with fewer than two
    * labels pass through unchanged. */
  def registrableDomain(
      url: Column,
      multiPartSuffixes: Seq[String] = DefaultMultiPartSuffixes): Column = {
    val h = lower(host(url))
    val parts = split(h, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(n >= 3 && last2.isInCollection(multiPartSuffixes), last3)
      .when(n >= 2, last2)
      .otherwise(h)
  }

  /** TABLE-driven registrable domain — the substitution hook the
    * fixed-list approximation declares: `psl` is one lowercase
    * `suffix` column of public-suffix entries of 1–3 labels (a real
    * PSL snapshot, broadcast — the list is metadata), the LONGEST
    * matching suffix wins, and the registrable domain is the suffix
    * plus one more host label. Hosts that have no label beyond their
    * matched suffix (the host IS a public suffix) and hosts matching
    * no entry pass through unchanged — same pass-through posture as
    * [[registrableDomain]]. Wildcard/exception PSL rules are out of
    * scope (declared; the entries relevant to training-data corpora
    * are plain).
    *
    * Three scalar broadcast left joins (one per candidate suffix
    * depth) — a narrow projection plus metadata joins, no explode, no
    * shuffle on the corpus.
    *
    * Parity contract (spec-pinned): with `psl` = the fixed multi-part
    * list ∪ the corpus's single-label TLDs, this equals
    * [[registrableDomain]] row for row. */
  def withRegistrableDomainFromTable(
      docs: DataFrame,
      urlCol: String,
      psl: DataFrame,
      out: String = "domain"): DataFrame = {
    val h = lower(host(col(urlCol)))
    val parts = split(h, "\\.")
    def lastK(k: Int) = concat_ws(".",
      (k to 1 by -1).map(i => element_at(parts, -i)): _*)
    val n = size(parts)
    val p = psl.select(lower(col("suffix")).as("_sfx")).distinct()
    docs
      .withColumn("_h", h).withColumn("_n", n)
      .withColumn("_s1", when(n >= 1, lastK(1)))
      .withColumn("_s2", when(n >= 2, lastK(2)))
      .withColumn("_s3", when(n >= 3, lastK(3)))
      .join(broadcast(p.select(col("_sfx").as("_m3"))),
        col("_s3") === col("_m3"), "left")
      .join(broadcast(p.select(col("_sfx").as("_m2"))),
        col("_s2") === col("_m2"), "left")
      .join(broadcast(p.select(col("_sfx").as("_m1"))),
        col("_s1") === col("_m1"), "left")
      .withColumn(out,
        when(col("_m3").isNotNull && col("_n") >= 4, lastK(4))
          .when(col("_m3").isNotNull, col("_h"))
          .when(col("_m2").isNotNull && col("_n") >= 3, lastK(3))
          .when(col("_m2").isNotNull, col("_h"))
          .when(col("_m1").isNotNull && col("_n") >= 2, lastK(2))
          .otherwise(col("_h")))
      .drop("_h", "_n", "_s1", "_s2", "_s3", "_m1", "_m2", "_m3")
  }

  /** Blocklist + per-domain cap over a URL-carrying corpus: annotate
    * each row with its registrable `domain`, anti-join the blocklist
    * (one `domain` column; broadcast), and keep at most `cap` rows per
    * surviving domain in deterministic md5(`idCol`) order
    * ([[Curation.sampleFixedK]] — adds `sample_rank`). */
  def curate(
      docs: DataFrame,
      idCol: String,
      urlCol: String,
      blocklist: DataFrame,
      cap: Int,
      multiPartSuffixes: Seq[String] = DefaultMultiPartSuffixes): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val dom = docs.withColumn("domain",
      registrableDomain(col(urlCol), multiPartSuffixes))
    val kept = dom.join(broadcast(blocklist.select(col("domain"))),
      Seq("domain"), "left_anti")
    Curation.sampleFixedK(kept, idCol, "domain", cap)
  }
}
