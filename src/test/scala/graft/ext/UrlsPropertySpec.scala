package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for [[Urls]]: URLs BUILT from generated parts must parse
  * back to exactly those parts (modulo the documented canonicalizations),
  * and canonicalization must be idempotent — canon(canon(u)) = canon(u).
  * Guards the regex semantics beyond the catalog's five fixed branches. */
class UrlsPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def forSamples[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(i.toLong * 7919)
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try body(a)
          catch { case e: Throwable =>
            throw new AssertionError(s"property failed for seed $i: $e", e) }
        case None => ()
      }
    }

  private case class Parts(scheme: String, userinfo: Option[String],
      host: String, port: Option[Int], path: String,
      query: Option[String], frag: Option[String]) {
    def url: String = {
      val ui = userinfo.map(_ + "@").getOrElse("")
      val p = port.map(":" + _).getOrElse("")
      val q = query.map("?" + _).getOrElse("")
      val f = frag.map("#" + _).getOrElse("")
      s"$scheme://$ui$host$p$path$q$f"
    }
  }

  private val label = Gen.choose(1, 6).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val partsGen: Gen[Parts] = for {
    scheme <- Gen.oneOf("http", "https", "ftp", "HTTP", "HttpS")
    ui <- Gen.option(Gen.oneOf("u", "u:pw"))
    nLabels <- Gen.choose(2, 4)
    labels <- Gen.listOfN(nLabels, label)
    upperHost <- Gen.oneOf(true, false)
    host0 = labels.mkString(".")
    host = if (upperHost) host0.toUpperCase else host0
    port <- Gen.option(Gen.choose(1, 65535))
    nSegs <- Gen.choose(0, 3)
    segs <- Gen.listOfN(nSegs, label)
    path = segs.map("/" + _).mkString
    query <- Gen.option(Gen.oneOf("a=1", "a=1&b=", "x"))
    frag <- Gen.option(Gen.oneOf("top", "S1"))
  } yield Parts(scheme, ui, host, port, path, query, frag)

  test("built URLs parse back to their parts") {
    forSamples(Gen.listOfN(16, partsGen)) { ps =>
      val rows = Urls.withUrlParts(
          ps.map(_.url).toDF("url"), "url")
        .select("url", "scheme", "host", "port", "path", "query", "frag")
        .collect()
      ps.zip(rows).foreach { case (p, r) =>
        assert(r.getString(1) === p.scheme.toLowerCase, s"scheme of ${p.url}")
        assert(r.getString(2) === p.host.toLowerCase, s"host of ${p.url}")
        assert(Option(r.get(3)).map(_.asInstanceOf[Int]) === p.port,
          s"port of ${p.url}")
        assert(r.getString(4) === p.path, s"path of ${p.url}")
        assert(Option(r.getString(5)) === p.query, s"query of ${p.url}")
        assert(Option(r.getString(6)) === p.frag, s"frag of ${p.url}")
      }
    }
  }

  test("canonicalization is idempotent") {
    forSamples(Gen.listOfN(16, partsGen)) { ps =>
      val once = Urls.withUrlParts(ps.map(_.url).toDF("url"), "url")
        .select(col("canon_url").as("url")).where(col("url").isNotNull)
      val twice = Urls.withUrlParts(once, "url")
        .select("url", "canon_url").collect()
      twice.foreach { r =>
        assert(r.getString(0) === r.getString(1),
          s"canon not a fixed point: ${r.getString(0)} -> ${r.getString(1)}")
      }
    }
  }

  test("registered domain is invariant under canonicalization") {
    forSamples(Gen.listOfN(16, partsGen)) { ps =>
      val df = Urls.withUrlParts(ps.map(_.url).toDF("url"), "url")
        .select(col("url"), col("reg_domain"),
          Urls.registeredDomain(Urls.urlHost(col("canon_url"))).as("rd2"))
        .collect()
      df.foreach { r =>
        assert(r.getString(1) === r.getString(2),
          s"reg_domain drifted through canon for ${r.getString(0)}")
      }
    }
  }
}
