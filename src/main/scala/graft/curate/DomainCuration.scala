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
