package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[Urls.withUrlPartsNative]] (one-pass native [[expressions.UrlPartsExpr]])
  * must be BIT-IDENTICAL to the regex chain [[Urls.withUrlParts]] — on
  * generated URLs and on the adversarial corner cases whose semantics the
  * regexes define (first-@ userinfo, last-? query, end-anchored port,
  * trailing dots, protocol-relative refs, bare schemes). */
class UrlExprSpec extends SparkSpec {
  import spark.implicits._

  private def assertTwinsAgree(urls: Seq[String]): Unit = {
    val cols = Seq("url", "scheme", "host", "port", "reg_domain", "path",
      "query", "frag", "canon_url")
    val a = Urls.withUrlParts(urls.toDF("url"), "url")
      .select(cols.head, cols.tail: _*).collect()
    val b = Urls.withUrlPartsNative(urls.toDF("url"), "url")
      .select(cols.head, cols.tail: _*).collect()
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra === rb, s"regex vs native diverge for ${ra.getString(0)}:" +
        s"\n regex:  $ra\n native: $rb")
    }
  }

  test("adversarial corner cases agree") {
    assertTwinsAgree(Seq(
      "https://WWW.Example.CO.UK:443/wiki/7?q=a&b=#Top",
      "http://u:p@api.HOST.example.com:8080/a/b/c",
      "HTTP://h.example.com:80",
      "ftp://files.h.example.org./pub/9#readme",
      "a?b?c#d#e",                      // last-? query, first-# fragment
      "http://a@b@c.example.com/x",     // userinfo strips through FIRST @
      "http://h.example.com:80a/x",     // port must be END-anchored → null
      "http://h.example.com:/x",        // empty port digits → null
      "http://h.example.com:99999999999/x", // >9-digit port → null, no throw
      "http://h.example.com:000000080/x",   // 9 digits with zeros → 80
      "http://@:80/x",                  // empty host with port
      "//proto.relative/path?q",        // authority without scheme
      "mailto:someone",                 // scheme, no authority
      "/just/a/path?q=1#f",
      "http://HOST...:8080?x#y",        // trailing dots + query, no path
      "weird",
      "",
      "http://h.example.com?#",         // empty query AND fragment
      "x+y-z.9://odd.scheme.example/p"))
  }

  test("generated URLs agree") {
    val label = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "https", "FTP", "HttpS")
      ui <- Gen.option(Gen.oneOf("u@", "u:pw@"))
      labels <- Gen.choose(1, 4).flatMap(Gen.listOfN(_, label))
      dots <- Gen.oneOf("", ".", "..")
      port <- Gen.option(Gen.choose(1, 65535))
      segs <- Gen.choose(0, 3).flatMap(Gen.listOfN(_, label))
      query <- Gen.option(Gen.oneOf("", "a=1", "a=1&b=", "x?y"))
      frag <- Gen.option(Gen.oneOf("", "top", "S?1"))
    } yield scheme + "://" + ui.getOrElse("") +
      labels.mkString(".").toUpperCase + dots +
      port.map(":" + _).getOrElse("") + segs.map("/" + _).mkString +
      query.map("?" + _).getOrElse("") + frag.map("#" + _).getOrElse("")
    (1 to 6).foreach { i =>
      Gen.listOfN(24, urlGen)
        .apply(Gen.Parameters.default, Seed(i.toLong * 31337))
        .foreach(assertTwinsAgree)
    }
  }
}
