package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Urls]] parse/canonicalization unit cases — including the edge shapes
  * the catalog's five synthesized branches don't cover (relative reference,
  * IPv4 host, single-label host, empty query/fragment). */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(url: String): Map[String, Any] = {
    val row = Urls.withUrlParts(Seq(url).toDF("url"), "url").collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("full URL: userinfo, mixed case, port, query, fragment") {
    val p = parse("HTTPS://User@WWW.Example.CO.UK:8443/A/b?x=1&y=#Sec")
    assert(p("scheme") === "https")
    assert(p("host") === "www.example.co.uk")
    assert(p("port") === 8443)
    assert(p("reg_domain") === "example.co.uk")
    assert(p("path") === "/A/b") // path case is significant, host case is not
    assert(p("query") === "x=1&y=")
    assert(p("frag") === "Sec")
    assert(p("canon_url") === "https://www.example.co.uk:8443/A/b?x=1&y=")
  }

  test("default ports dropped by canonicalization; kept by the parser") {
    assert(parse("http://h.example.com:80/p")("port") === 80)
    assert(parse("http://h.example.com:80/p")("canon_url") ===
      "http://h.example.com/p")
    assert(parse("https://h.example.com:443/")("canon_url") ===
      "https://h.example.com/")
    assert(parse("https://h.example.com:444/")("canon_url") ===
      "https://h.example.com:444/")
  }

  test("empty path canonicalizes to /; trailing host dot stripped") {
    val p = parse("https://Example.ORG.")
    assert(p("host") === "example.org")
    assert(p("path") === "")
    assert(p("canon_url") === "https://example.org/")
  }

  test("empty query and fragment are absent (NULL)") {
    val p = parse("http://h.example.com/a?#")
    assert(p("query") === null)
    assert(p("frag") === null)
  }

  test("registered domain: plain, multi-label suffix, single label, IPv4") {
    val hosts = Seq("a.b.example.com", "deep.example.co.uk", "example.com",
      "localhost", "10.0.0.1", "co.uk")
    val got = hosts.toDF("h")
      .select(Urls.registeredDomain(col("h"))).as[String].collect().toSeq
    assert(got === Seq("example.com", "example.co.uk", "example.com",
      "localhost", "10.0.0.1", "co.uk"))
  }

  test("relative reference: no scheme, no host, path preserved") {
    val p = parse("/just/a/path?q=1")
    assert(p("scheme") === null)
    assert(p("host") === null)
    assert(p("path") === "/just/a/path")
    assert(p("query") === "q=1")
  }

  test("hostRankJoin broadcasts the rank side and keeps unranked hosts") {
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "host_id")
    val ranks = Seq((10L, 111L), (20L, 222L)).toDF("node", "rank")
    val out = Urls.hostRankJoin(docs, "host_id", ranks, "node", "rank")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rank side must broadcast:\n$plan")
    val got = out.select("doc_id", "host_rank").as[(Long, Option[Long])]
      .collect().toMap
    assert(got === Map(1L -> Some(111L), 2L -> Some(222L), 3L -> None))
  }

  test("parse is a pure projection — no exchange, no join") {
    val df = Seq("https://a.example.com/x").toDF("url")
    val plan = Urls.withUrlParts(df, "url").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"URL parse must stay a zero-shuffle projection:\n$plan")
  }
}
