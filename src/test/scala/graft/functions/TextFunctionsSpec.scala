package graft.functions

class UrlCanonicalizeSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toDF("u")
      .select(graft.functions.TextFunctions.canonicalizeUrl(col("u")))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("canonicalizeUrl lowercases scheme/host, keeps path case") {
    assert(canon("HTTP://WWW.Example.COM/Path/To") ==
      Seq(Some("http://www.example.com/Path/To")))
  }

  test("default ports drop, explicit ports stay") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x", "http://a.com:8080/x") ==
      Seq(Some("http://a.com/x"), Some("https://a.com/x"),
        Some("http://a.com:8080/x")))
  }

  test("tracking params drop, survivors sort, fragment drops") {
    assert(canon("https://a.com/p?b=2&utm_source=tw&a=1&fbclid=xyz#sec") ==
      Seq(Some("https://a.com/p?a=1&b=2")))
    // all params tracking -> no query at all
    assert(canon("https://a.com/p?utm_a=1&utm_b=2") ==
      Seq(Some("https://a.com/p")))
  }

  test("empty path becomes /, non-URLs canonicalize to null") {
    assert(canon("https://a.com", "not a url", "ftp//broken") ==
      Seq(Some("https://a.com/"), None, None))
  }
}
