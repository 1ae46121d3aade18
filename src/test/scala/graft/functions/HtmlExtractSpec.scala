package graft.functions

class HtmlExtractSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def extract(html: String,
      minChars: Int = 25, maxLinkPermille: Int = 333): Option[String] =
    Seq(Option(html)).toDF("h")
      .select(TextFunctions.htmlExtract(col("h"), minChars, maxLinkPermille))
      .collect().map(r => Option(r.getString(0))).head

  private val prose =
    "The quick brown fox jumps over the lazy dog near the river bank."

  test("keeps prose, drops head/script/style/comments wholesale") {
    val html =
      s"""<html><head><title>T</title><style>p { color: red }</style>
         |<script>var a = 1; if (a > 0) { emit("<p>fake</p>"); }</script>
         |</head><body><!-- boilerplate note --><p>$prose</p></body></html>""".stripMargin
    assert(extract(html) == Some(prose))
  }

  test("drops link-dense blocks (nav, footer, related lists) by density") {
    val html =
      s"""<body>
         |<nav><a href="/">Home page anchor text here</a> <a href="/a">About page anchor text</a></nav>
         |<p>$prose</p>
         |<ul><li><a href="/r">A related article anchor long enough to pass minChars</a></li></ul>
         |<div class="f"><a href="/t">Terms of service agreement text</a> | <a href="/p">Privacy policy statement text</a></div>
         |</body>""".stripMargin
    assert(extract(html) == Some(prose))
  }

  test("drops too-short blocks; multiple kept blocks join with newline") {
    val second = "A second paragraph of real content follows the first one."
    val html = s"<body><p>$prose</p><p>Read more...</p><p>$second</p></body>"
    assert(extract(html) == Some(s"$prose\n$second"))
  }

  test("strips inline tags, collapses whitespace, unescapes entities") {
    val html = "<p>One   <b>bold</b>\n\t<i>claim</i> &amp; a &lt;tag&gt; " +
      "&quot;quoted&quot;&nbsp;&nbsp;with&#39;s entity, padded to pass minChars.</p>"
    assert(extract(html) == Some(
      "One bold claim & a <tag> \"quoted\" with's entity, padded to pass minChars."))
  }

  test("double-escaped entities unescape exactly one level (&amp; last)") {
    val html = "<p>Literal ampersand-l-t escape &amp;lt; stays one level escaped here.</p>"
    assert(extract(html) == Some(
      "Literal ampersand-l-t escape &lt; stays one level escaped here."))
  }

  test("a block mixing prose and a link survives while a pure-link block dies") {
    val mixed = s"""<p>$prose See <a href="/x">the appendix</a> for details.</p>"""
    val got = extract(s"<body>$mixed</body>").get
    assert(got == s"$prose See the appendix for details.")
  }

  test("null html -> null; all-boilerplate html -> empty string") {
    assert(extract(null) == None)
    assert(extract("<body><p>short</p><nav><a href='/'>Home nav anchor text block</a></nav></body>")
      == Some(""))
  }

  test("invalid arguments fail loudly") {
    intercept[IllegalArgumentException](
      TextFunctions.htmlExtract(col("h"), minChars = 0))
    intercept[IllegalArgumentException](
      TextFunctions.htmlExtract(col("h"), maxLinkPermille = 1001))
  }

  test("registered query matches its ground-truth oracle shape at sf0.001") {
    val out = graft.SparkEntry.queries("html_extract")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val text = docs(id)
      val expected = text + " & notes <draft>" + (if (id % 3 == 0)
        "\n" + ("Appendix A. " + text.take(80).toUpperCase).trim else "")
      assert(r.getString(1) == expected, s"doc $id")
    }
  }

  test("plan is map-only: no exchange anywhere in the extraction") {
    val plan = graft.SparkEntry.queries("html_extract")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
