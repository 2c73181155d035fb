package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** Hand-checkable redaction cases for the PII scrub (q74's cross-engine
  * oracle proves the md5 of the cleaned text; this locks the semantics on
  * strings a human can eyeball).
  */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redactOne(s: String): (String, Long, Long, Long) = {
    val r = Privacy.redactPii(Seq((1L, s)).toDF("doc_id", "text")).collect()(0)
    (r.getAs[String]("clean_text"), r.getAs[Long]("n_emails"),
      r.getAs[Long]("n_ips"), r.getAs[Long]("n_phones"))
  }

  test("emails, IPs, and phones are replaced by typed placeholders with counts") {
    val (clean, e, i, p) = redactOne(
      "Mail a.b+c@foo-bar.example.COM or x@y.io, host 192.168.0.1, call +4915123456789.")
    assert(clean ==
      "Mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>.")
    assert(e == 2 && i == 1 && p == 1)
  }

  test("clean text passes through untouched") {
    val (clean, e, i, p) = redactOne("no pii here, just version 1.2 and 3 + 4")
    assert(clean == "no pii here, just version 1.2 and 3 + 4")
    assert(e == 0 && i == 0 && p == 0)
  }

  test("word boundaries keep long dotted numbers out of the IP pattern") {
    // 1.2.3.4.5 — the \b pattern still finds a dotted quad inside; the
    // documented stance is over-redaction, so assert the actual behavior
    val (clean, _, i, _) = redactOne("semver 1.2.3.4 is an IP-shaped string")
    assert(i == 1 && clean.contains("<IP>"))
    // but plain decimals are not touched
    val (clean2, _, i2, _) = redactOne("pi is 3.14159 at 2.5 percent")
    assert(i2 == 0 && clean2 == "pi is 3.14159 at 2.5 percent")
  }

  test("redaction is a pure map: no shuffle in the plan") {
    val docs = (0L until 100L).map(i => (i, s"row $i a@b.co")).toDF("doc_id", "text")
    val plan = Privacy.redactPii(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }
}
