package graft

import org.apache.spark.sql.functions._
import graft.operators.HtmlExtract

/** HtmlExtract (tx11's operator): the jusText/Arc90-style
  * main-content extractor — tag classes, entity decode order, density
  * gates, null/empty contracts, and the no-UDF plan shape. The planted
  * fixture's end-to-end values are the tx11 VALUES oracle; this spec
  * pins the per-contract edges a point fixture can't.
  */
class HtmlExtractSpec extends SparkSpec {

  private def extract(html: String, minChars: Int = 20,
                      maxLink: Double = 0.5): String = {
    val session = spark
    import session.implicits._
    Seq(html).toDF("h")
      .select(HtmlExtract.extractText(col("h"), minChars, maxLink).as("t"))
      .head().getString(0)
  }

  test("containers drop with content; block tags split; inline tags unwrap") {
    // script containing a bare '<' and a '>' inside a string literal
    extract("<script>if (a < b) { s = \"x>y\"; }</script>" +
      "<p>one long enough paragraph of prose</p>") shouldBe
      "one long enough paragraph of prose"
    // uppercase tags are the same tags
    extract("<SCRIPT>var x;</SCRIPT><P>one long enough paragraph of prose</P>") shouldBe
      "one long enough paragraph of prose"
    // inline markup unwraps in place, block markup breaks the line
    extract("<p>first block keeps its <em>inline</em> span</p>" +
      "<p>second block is its own line entirely</p>") shouldBe
      "first block keeps its inline span\nsecond block is its own line entirely"
  }

  test("source line-wrapping renders as spaces — only block tags break lines") {
    // markup wrapped across source lines is ONE rendered paragraph: the
    // fragments must not be density-gated one by one (review r17)
    extract("<p>Great product overall.\nWould buy again without\nhesitation.</p>") shouldBe
      "Great product overall. Would buy again without hesitation."
    // tabs and CRLF are source whitespace too
    extract("<p>Great product overall.\r\n\tWould buy again without hesitation.</p>") shouldBe
      "Great product overall. Would buy again without hesitation."
  }

  test("entity decode: after tag strip, &amp; last (no double decode)") {
    // &amp;lt; must yield the LITERAL text "&lt;", not "<"
    extract("<p>write &amp;lt; for a literal less-than sign</p>") shouldBe
      "write &lt; for a literal less-than sign"
    // a decoded '<' can never re-form a tag (decode runs post-strip)
    extract("<p>math says 1 &lt;b&gt; 0 is a false statement</p>") shouldBe
      "math says 1 <b> 0 is a false statement"
  }

  test("density gates: short lines and link-heavy lines drop; knobs move the gates") {
    val nav = "<li><a href=\"/x\">twenty characters of linked text</a></li>" +
      "<li>twenty characters of plain text here</li>"
    extract(nav) shouldBe "twenty characters of plain text here"
    // maxLinkDensity 1.0 admits the pure link line
    extract(nav, maxLink = 1.0) shouldBe
      "twenty characters of linked text\ntwenty characters of plain text here"
    // minLineChars 1 admits arbitrarily short prose
    extract("<p>ok</p><p>twenty characters of plain text here</p>", minChars = 1) shouldBe
      "ok\ntwenty characters of plain text here"
  }

  test("null/empty contracts: null html -> null; all-boilerplate -> empty string") {
    val session = spark
    import session.implicits._
    val rows = Seq((1L, null: String), (2L, "<p><a href=x>only a link list</a></p>"))
      .toDF("id", "h")
      .select(col("id"), HtmlExtract.extractText(col("h")).as("t"))
      .orderBy("id").collect()
    rows(0).isNullAt(1) shouldBe true
    rows(1).getString(1) shouldBe ""
  }

  test("invalid knobs fail loudly; plan is pure native expressions (no UDF)") {
    val session = spark
    import session.implicits._
    an[IllegalArgumentException] should be thrownBy
      HtmlExtract.contentLines(col("h"), minLineChars = 0)
    an[IllegalArgumentException] should be thrownBy
      HtmlExtract.contentLines(col("h"), maxLinkDensity = 1.5)
    val df = Seq("<p>some long enough paragraph of text</p>").toDF("h")
      .select(HtmlExtract.extractText(col("h")).as("t"))
    df.queryExecution.executedPlan.toString should not include "UDF"
  }
}
