package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, forAllNoShrink}

import graft.SparkSpec

/** ScalaCheck invariants for the URL hygiene operators: canonicalization
  * must be idempotent (a canonical URL re-canonicalizes to itself — the
  * property that makes it a valid DEDUP KEY), and the registrable domain
  * must be a real suffix of the host with the heuristic's label count.
  */
object HtmlExtractProps extends Properties("htmlExtract") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private def canon(urls: Seq[String]): Seq[String] =
    urls.toDF("u").select(HtmlExtract.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  private def regdom(hosts: Seq[String]): Seq[String] =
    hosts.toDF("h").select(HtmlExtract.registrableDomain(col("h"))).as[String].collect().toSeq

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HttpS")
    sub <- Gen.oneOf("", "WWW.", "a.B.")
    site <- Gen.choose(0, 9).map(i => s"Site$i")
    tld <- Gen.oneOf("com", "ORG", "co.uk", "ac.jp")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "x1", "")).map(_.mkString("/")))
    tail <- Gen.oneOf("", "/index.html", "/")
    params <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "gclid=g", "z=9&y=8"))
    frag <- Gen.oneOf("", "#top", "#a=b")
  } yield s"$scheme://$sub$site.$tld$port/$segs$tail" +
    (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag

  property("canonicalizeUrl is idempotent (valid dedup key)") =
    forAllNoShrink(Gen.listOfN(8, urlGen)) { urls =>
      val once = canon(urls)
      canon(once) == once
    }

  property("canonical output has no fragment, no SCHEME-default port, no doubled slash, sorted params") =
    forAllNoShrink(Gen.listOfN(8, urlGen)) { urls =>
      canon(urls).forall { c =>
        val hostport = c.substring(c.indexOf("://") + 3).takeWhile(_ != '/')
        val defaultPortStripped =
          (!c.startsWith("http://") || !hostport.endsWith(":80")) &&
            (!c.startsWith("https://") || !hostport.endsWith(":443"))
        val path = c.substring(c.indexOf("://") + 3).dropWhile(_ != '/').takeWhile(_ != '?')
        val q = c.dropWhile(_ != '?').drop(1)
        !c.contains("#") && defaultPortStripped && !c.contains("utm_") &&
          !path.contains("//") &&
          (q.isEmpty || { val ps = q.split("&").toSeq; ps == ps.sorted })
      }
    }

  private val hostGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    labels <- Gen.listOfN(n, Gen.choose(0, 20).map(i => s"l$i"))
    tld <- Gen.oneOf("com", "net", "co.uk", "ac.jp", "gov.uk", "io")
  } yield (labels :+ tld).mkString(".")

  property("registrableDomain is a dot-boundary suffix of the host, 2 or 3 labels") =
    forAll(Gen.listOfN(8, hostGen)) { hosts =>
      regdom(hosts).zip(hosts).forall { case (d, h) =>
        (h == d || h.endsWith("." + d)) && {
          val n = d.count(_ == '.') + 1
          n == 2 || n == 3
        }
      }
    }
}
