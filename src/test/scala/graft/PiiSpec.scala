package graft

import org.apache.spark.sql.functions._
import graft.ops.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def annotate(texts: Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val counted = Pii.counts($"text").foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    counted.withColumn("redacted", Pii.redact($"text"))
      .orderBy($"id")
      .as[(Long, String, Int, Int, Int, String)]
      .collect()
  }

  test("detects and redacts planted emails, phones, IPs") {
    val rows = annotate(Seq(
      "write to alice.smith+tag@sub.example.org today",
      "call 555-123-4567 or +1 800 555 1212 maybe",
      "server at 192.168.0.1 and 10.0.0.255 are up",
      "clean text with no pii at all"))
    assert(rows(0)._3 == 1 && rows(0)._6 == "write to <EMAIL> today")
    // "800 555 1212" also fits the 3-3-4 shape (the "+1 " prefix doesn't)
    assert(rows(1)._4 == 2 && rows(1)._6 == "call <PHONE> or +1 <PHONE> maybe")
    assert(rows(2)._5 == 2 && rows(2)._6 == "server at <IP> and <IP> are up")
    assert(rows(3)._3 == 0 && rows(3)._4 == 0 && rows(3)._5 == 0)
    assert(rows(3)._6 == "clean text with no pii at all")
  }

  test("redaction order: email digits are not re-matched by phone/IP") {
    val rows = annotate(Seq("ping 123.456.7890.11@host.example now"))
    // the whole token is one email; after <EMAIL> no digits remain
    assert(rows(0)._6 == "ping <EMAIL> now")
    assert(!rows(0)._6.contains("<IP>") && !rows(0)._6.contains("<PHONE>"))
  }

  test("ip word boundary: digits embedded in words don't match") {
    val rows = annotate(Seq("version v1.2.3.4beta is out", "net 1.2.3.4 ok"))
    assert(rows(0)._5 == 0)
    assert(rows(1)._5 == 1 && rows(1)._6 == "net <IP> ok")
  }

  test("t9 query: every planted kind is found at sf0.001") {
    val out = graft.analytics.TextQueries.pii(spark, sfDir)
      .agg(sum($"n_emails"), sum($"n_phones"), sum($"n_ips"))
      .as[(Long, Long, Long)].head()
    assert(out._1 > 0 && out._2 > 0 && out._3 > 0)
    // redaction removed every detected span
    val leftover = graft.analytics.TextQueries.pii(spark, sfDir)
      .filter($"n_emails" > 0 && $"redacted".rlike(Pii.EmailRe))
      .count()
    assert(leftover == 0)
  }
}
