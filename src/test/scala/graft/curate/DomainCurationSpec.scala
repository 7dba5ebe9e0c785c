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

  test("withRegistrableDomainFromTable agrees with the fixed list on its suffixes") {
    val urls = Seq(
      "https://www.example.com/path?q=1",
      "http://blog.news.example.co.uk/a",
      "https://example.org",
      "https://a.b.c.d.example.com/",
      "https://EXAMPLE.COM/x",
      "https://localhost/admin",
      "ftp://files.example.net/pub",
      "https://co.uk/",
      "https://shop.store.com.au/x",
      "https://deep.sub.site.ac.uk/y")
    val docs = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    // table = the fixed multi-part list + the corpus's 1-label TLDs
    // (the fixed approximation implicitly treats every TLD as public)
    val psl = (DomainCuration.DefaultMultiPartSuffixes ++
      Seq("com", "org", "net", "uk", "au")).toDF("suffix")
    val viaTable = DomainCuration
      .withRegistrableDomainFromTable(docs, "url", psl)
      .orderBy("doc_id").collect().map(_.getAs[String]("domain"))
    val viaList = docs
      .withColumn("domain", DomainCuration.registrableDomain(col("url")))
      .orderBy("doc_id").collect().map(_.getAs[String]("domain"))
    assert(viaTable.toSeq === viaList.toSeq)
  }

  test("withRegistrableDomainFromTable: 3-label suffixes, longest match, pass-through") {
    val docs = Seq(
      (1L, "https://www.city.act.edu.au/x"),  // 3-label entry wins
      (2L, "https://act.edu.au/"),            // host IS the suffix
      (3L, "https://site.edu.au/"),           // 2-label entry
      (4L, "https://weird.zz/"),              // no entry: pass-through
      (5L, "https://single/")                 // 1 label: pass-through
    ).toDF("doc_id", "url")
    val psl = Seq("act.edu.au", "edu.au", "au").toDF("suffix")
    val got = DomainCuration.withRegistrableDomainFromTable(docs, "url", psl)
      .orderBy("doc_id").collect().map(_.getAs[String]("domain"))
    assert(got.toSeq === Seq(
      "city.act.edu.au", "act.edu.au", "site.edu.au", "weird.zz", "single"))
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
