package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainCurationSpec extends SparkSpec {
  import spark.implicits._

  test("registrableDomain: plain, multi-part, deep, degenerate hosts") {
    val cases = Seq(
      ("https://www.example.com/path?q=1", "example.com"),
      ("http://blog.news.example.co.uk/a", "example.co.uk"),
      ("https://example.org", "example.org"),
      ("https://a.b.c.d.example.com/", "example.com"),
      ("https://EXAMPLE.COM/x", "example.com"),   // case-folded
      ("https://localhost/admin", "localhost"),   // single label
      ("ftp://files.example.net/pub", "example.net"),
      ("https://co.uk/", "co.uk"))                // bare suffix: 2 labels
    val got = cases.map(_._1).toDF("url")
      .select(DomainCuration.registrableDomain(col("url")).as("d"))
      .collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("curate: blocklist drops, cap binds per domain, rank deterministic") {
    // 12 docs on bad.com, 3 on ok.org, 1 on solo.co.uk
    val docs = ((1L to 12L).map(i => (i, s"https://www.bad.com/p/$i")) ++
      (21L to 23L).map(i => (i, s"https://ok.org/p/$i")) ++
      Seq((31L, "https://x.solo.co.uk/p/31")))
      .toDF("doc_id", "url")
    val block = Seq("blocked.net").toDF("domain")
    val out = DomainCuration.curate(docs, "doc_id", "url", block, cap = 5)
    val byDom = out.collect()
      .groupBy(_.getAs[String]("domain"))
      .view.mapValues(_.length).toMap
    assert(byDom === Map("bad.com" -> 5, "ok.org" -> 3, "solo.co.uk" -> 1))
    // blocklisted domain removes every doc
    val out2 = DomainCuration.curate(docs, "doc_id", "url",
      Seq("bad.com").toDF("domain"), cap = 5)
    assert(!out2.collect().map(_.getAs[String]("domain")).contains("bad.com"))
    // deterministic across runs
    val a = out.orderBy("domain", "sample_rank").collect().map(_.toString)
    val b = DomainCuration.curate(docs, "doc_id", "url", block, cap = 5)
      .orderBy("domain", "sample_rank").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
