package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String, c: org.apache.spark.sql.Column): Any =
    Seq(html).toDF("h").select(c.as("v")).collect().head.get(0)

  test("visibleText: strips tags, drops script/style payloads, collapses ws") {
    val page = "<html><body><script>var x = 1 < 2;</script>" +
      "<style>p { color: red }</style><h1>Hello</h1>\n  <p>world   now</p>" +
      "</body></html>"
    assert(one(page, Html.visibleText(col("h"))) == "Hello world now")
  }

  test("decodeEntities: &amp; decodes LAST so &amp;lt; stays literal") {
    assert(one("a &amp;lt; b &lt; c &nbsp;&quot;q&#39;",
      Html.decodeEntities(col("h"))) == "a &lt; b < c  \"q'")
  }

  test("title: extracted, entity-decoded; empty when absent") {
    assert(one("<title>A &amp; B</title>", Html.title(col("h"))) == "A & B")
    assert(one("<TITLE lang=en>\n x \n</TITLE>", Html.title(col("h"))) == "x")
    assert(one("<p>no title</p>", Html.title(col("h"))) == "")
  }

  test("anchorTexts + tagCount + linkDensity arithmetic") {
    val page = "<body><a href='/x'>link one</a><p>plain prose here</p>" +
      "<a>two</a></body>"
    assert(one(page, size(Html.anchorTexts(col("h")))) == 2)
    // opening tags: body, a, p, a = 4 (closing tags don't match)
    assert(one(page, Html.tagCount(col("h"))) == 4)
    // visible = "link one plain prose here two" (29 chars),
    // anchor chars = 8 + 3 = 11
    val vt = one(page, Html.visibleText(col("h"))).asInstanceOf[String]
    assert(vt == "link one plain prose here two")
    assert(one(page, Html.linkDensity(col("h"))) ==
      math.rint(11.0 / 29 * 1e6) / 1e6)
  }

  test("linkDensity: zero on a page with no visible text") {
    assert(one("<script>x</script>", Html.linkDensity(col("h"))) == 0.0)
  }

  test("malformed markup degrades to whitespace, never errors") {
    val got = one("<p <b>broken <a>text", Html.visibleText(col("h")))
    assert(got.asInstanceOf[String].contains("text"))
  }

  test("markdownSections: preamble, levels, bodies, empty sections") {
    import spark.implicits._
    val md = "before any heading\nsecond intro line\n# Top\nbody 1\nbody 2\n" +
      "## Sub A\n### Deep\ndeep body\n####### not-a-heading\n#nospace"
    val got = Html.markdownSections(Seq((1L, md)).toDF("id", "t"), "id", "t")
      .orderBy("sec")
      .select("sec", "level", "title", "body", "n_lines").collect()
    assert(got.length == 4)
    // preamble: sec 0, level 0, null title, both intro lines in order
    assert(got(0).getLong(0) == 0L && got(0).getInt(1) == 0 &&
      got(0).isNullAt(2) &&
      got(0).getString(3) == "before any heading\nsecond intro line")
    assert(got(1).getString(2) == "Top" && got(1).getInt(1) == 1 &&
      got(1).getString(3) == "body 1\nbody 2")
    // heading directly followed by a heading → empty body, zero lines
    assert(got(2).getString(2) == "Sub A" && got(2).getInt(1) == 2 &&
      got(2).getString(3) == "" && got(2).getLong(4) == 0L)
    // 7+ #'s and #-without-space are BODY lines, not headings
    assert(got(3).getString(2) == "Deep" && got(3).getInt(1) == 3 &&
      got(3).getString(3) == "deep body\n####### not-a-heading\n#nospace")
  }

  test("markdownSections: doc with no headings is one preamble section") {
    import spark.implicits._
    val got = Html.markdownSections(
      Seq((1L, "just\nplain\ntext")).toDF("id", "t"), "id", "t").collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("sec") == 0L &&
      got(0).getAs[Long]("n_lines") == 3L)
  }
}
