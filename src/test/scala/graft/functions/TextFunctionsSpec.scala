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

class UrlCanonicalizePropertySpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.TextFunctions.canonicalizeUrl

  test("canonicalization is idempotent over generated URL space") {
    val rnd = new scala.util.Random(23)
    val schemes = Seq("http", "HTTP", "https", "HtTpS", "ftp")
    val hosts = Seq("A.com", "sub.B.ORG", "x-y.net", "localhost")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/P/q", "/a%20b")
    val queries = Seq("", "?a=1", "?b=2&a=1", "?utm_source=t&z=9&a=1", "?utm_only=1")
    val frags = Seq("", "#x")
    val urls = Seq.fill(300) {
      schemes(rnd.nextInt(schemes.size)) + "://" +
        hosts(rnd.nextInt(hosts.size)) + ports(rnd.nextInt(ports.size)) +
        paths(rnd.nextInt(paths.size)) + queries(rnd.nextInt(queries.size)) +
        frags(rnd.nextInt(frags.size))
    }
    val df = urls.toDF("u").select(
      canonicalizeUrl(col("u")).as("c1"),
      canonicalizeUrl(canonicalizeUrl(col("u"))).as("c2"))
    val rows = df.collect()
    assert(rows.forall(r => r.getString(0) != null))
    assert(rows.forall(r => r.getString(0) == r.getString(1)),
      rows.filter(r => r.getString(0) != r.getString(1)).take(3).mkString("; "))
  }

  test("null and garbage inputs stay null, never throw") {
    val out = Seq(Some("https://ok.com/x"), None, Some(""), Some("::::"),
      Some("http//nope"))
      .toDF("u").select(canonicalizeUrl(col("u"))).collect()
      .map(r => Option(r.getString(0)))
    assert(out(0).contains("https://ok.com/x"))
    assert(out.drop(1).forall(_.isEmpty))
  }
}
