package graft.operators

import graft.SparkSpecBase

/** The scrub must mask each PII class exactly once (no double-masking a
  * phone's digits as a number run) and leave clean text untouched. */
class PiiScrubSpec extends SparkSpecBase {

  private def scrubOne(text: String): (Long, Long, Long, String) = {
    import spark.implicits._
    val r = PiiScrub.scrub(Seq((1L, text)).toDF("id", "t"), "t").collect().head
    (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
      r.getAs[Long]("n_nums"), r.getAs[String]("scrubbed"))
  }

  test("masks emails, phones and digit runs independently") {
    val (e, p, n, s) =
      scrubOne("mail bob.smith+x@corp.example.org or +44-555-0123, acct 12345678")
    assert((e, p, n) == (1L, 1L, 1L))
    assert(s == "mail <EMAIL> or <PHONE>, acct <NUM>")
  }

  test("phone digits are not re-counted as number runs") {
    val (e, p, n, s) = scrubOne("call +1-800-5551 now")
    assert((e, p, n) == (0L, 1L, 0L))
    assert(s == "call <PHONE> now")
  }

  test("email digits are not re-counted; short digit runs survive") {
    val (e, p, n, s) = scrubOne("u123456@a.io pin 123 code 9999")
    assert((e, p, n) == (1L, 0L, 1L))
    assert(s == "<EMAIL> pin 123 code <NUM>")
  }

  test("mixed-case emails are masked whole") {
    val (e, p, n, s) = scrubOne("contact John.Doe@Gmail.COM today")
    assert((e, p, n) == (1L, 0L, 0L))
    assert(s == "contact <EMAIL> today")
  }

  test("clean text passes through unchanged") {
    val (e, p, n, s) = scrubOne("no sensitive content here at all")
    assert((e, p, n) == (0L, 0L, 0L))
    assert(s == "no sensitive content here at all")
  }
}
