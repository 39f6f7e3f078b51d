package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): Option[String] =
    Seq(u).toDF("u").select(Url.canonicalize(col("u"))).as[Option[String]]
      .head()

  test("canonicalize lowercases scheme/host, strips www/fragment/tracking") {
    assert(canon("HTTP://WWW.Site1.Example.COM/a/b2/?utm_source=feed&b=2&a=1")
      === Some("http://site1.example.com/a/b2?a=1&b=2"))
  }

  test("canonicalize drops default ports, keeps explicit non-default ones") {
    assert(canon("https://News.Site2.CO.UK:443/Index.html#frag")
      === Some("https://news.site2.co.uk/Index.html"))
    assert(canon("http://site.example.com:80/p") ===
      Some("http://site.example.com/p"))
    assert(canon("http://user:pw@Site3.example.com:8080//x//?gclid=z&q=5")
      === Some("http://site3.example.com:8080//x?q=5"))
    // :443 is only default on https, :80 only on http
    assert(canon("http://h.example.com:443/p") ===
      Some("http://h.example.com:443/p"))
  }

  test("canonicalize handles trailing-dot host, root path, empty query") {
    assert(canon("https://Site4.Example.com./") ===
      Some("https://site4.example.com"))
    assert(canon("https://a.com.au/x/?utm_campaign=x&utm_medium=y") ===
      Some("https://a.com.au/x"))
    assert(canon("http://a.example.com/p?b=&fbclid=abc&z=9&y=8") ===
      Some("http://a.example.com/p?b=&y=8&z=9"))
  }

  test("non-http(s) and scheme-less values canonicalize to null") {
    assert(canon("ftp://site.example.com/file").isEmpty)
    assert(canon("mailto:a@b.com").isEmpty)
    assert(canon("just text, no url").isEmpty)
    assert(canon("://missing.scheme/x").isEmpty)
  }

  test("registeredDomain: two labels, pinned multi-suffixes, single label") {
    val got = Seq(
      "www.example.com", "news.bbc.co.uk", "a.b.c.example.com",
      "blog.shop.com.au", "intranet", "co.uk")
      .toDF("h").select(Url.registeredDomain(col("h"))).as[String].collect()
    assert(got.toSeq === Seq(
      "example.com", "bbc.co.uk", "example.com",
      "shop.com.au", "intranet", "co.uk"))
  }

  test("domainCap keeps at most cap per registered domain, deterministically") {
    val df = (0L until 200L).toDF("id")
      .withColumn("url",
        concat(lit("http://www.example"), (col("id") % 5).cast("string"),
          lit(".com/p"), col("id").cast("string")))
    val kept = Url.domainCap(df, "id", "url", cap = 7)
    val perDom = kept.groupBy("domain").count().as[(String, Long)].collect()
    assert(perDom.length === 5)
    assert(perDom.forall(_._2 === 7L))
    // deterministic: same selection on a differently-partitioned input
    val kept2 = Url.domainCap(df.repartition(13), "id", "url", cap = 7)
    assert(kept.select("id").as[Long].collect().sorted.toSeq ===
      kept2.select("id").as[Long].collect().sorted.toSeq)
  }

  test("UrlParts parser ≡ the regex formulation on adversarial inputs") {
    // the DuckDB oracle keeps the regex form — the parser must agree on
    // every component, including the weird corners
    val inputs = Seq(
      "HTTP://WWW.Site1.Example.COM/a/b2/?utm_source=feed&b=2&a=1",
      "https://News.Site2.CO.UK:443/Index.html#frag",
      "http://user:pw@Site3.example.com:8080//x//?gclid=z&q=5",
      "https://Site4.Example.com./", "http://intranet:9999/dev?a=2#x",
      "http://a.com..", "http://h.example.com:080/p", "http://x.com:",
      "http://a@b@c.com/p", "http:///nohost", "https://h.com#f?after=hash",
      "  http://padded.com/p  ", "http://h.com/deep///", "ftp://x.com/",
      "http://h.com?only=q", "http://h.com:65536/p")
    val df = inputs.toDF("u")
    val viaParser = df.select(
      Url.scheme(col("u")), Url.host(col("u")),
      Url.nonDefaultPort(col("u")).cast("string"),
      Url.path(col("u")), Url.canonicalQuery(col("u"))).collect().toSeq
    val sch0 = lower(regexp_extract(trim(col("u")),
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val sch = when(sch0.isin("http", "https"), sch0)
    val auth = regexp_extract(trim(col("u")),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val h0 = lower(regexp_replace(regexp_replace(noUser, ":[0-9]*$", ""),
      "\\.$", ""))
    val prt = regexp_extract(noUser, ":([0-9]+)$", 1)
    val tracking = Url.trackingParams
    val viaRegex = df.select(
      sch,
      when(sch.isNotNull && h0 =!= "", h0),
      when(sch.isNotNull && prt =!= "" &&
        !(sch === "http" && prt === "80") &&
        !(sch === "https" && prt === "443"),
        prt.cast("int")).cast("string"),
      when(sch.isNotNull, regexp_replace(regexp_extract(trim(col("u")),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1), "/+$", "")),
      when(sch.isNotNull, array_join(array_sort(
        filter(split(regexp_extract(trim(col("u")), "\\?([^#]*)", 1), "&"),
          p => {
            val k = lower(split(p, "=").getItem(0))
            p =!= "" && !k.isin(tracking: _*) && !k.startsWith("utm_")
          })), "&"))).collect().toSeq
    viaParser.zip(viaRegex).zip(inputs).foreach { case ((a, b), u) =>
      assert(a == b, s"input: $u")
    }
  }

  test("CanonQuery expression ≡ the declarative filter/sort formulation") {
    val queries = Seq(
      "b=2&a=1&utm_source=x", "", "a=1&", "&&", "gclid=z", "x", "x&x&a",
      "UTM_TERM=q&ref=h&z=", "k=v=w&K=2", "a=ü&b=é", "utm_x=1&UTMZ=keep")
    val viaExpr = queries.toDF("q").select(
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.expressions.CanonQuery(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("q")))))
      .as[String].collect().toSeq
    val tracking = Url.trackingParams
    val viaHof = queries.toDF("q").select(
      array_join(array_sort(filter(split(col("q"), "&"), p => {
        val k = lower(split(p, "=").getItem(0))
        p =!= "" && !k.isin(tracking: _*) && !k.startsWith("utm_")
      })), "&")).as[String].collect().toSeq
    assert(viaExpr == viaHof)
    // and the hand-expected values
    assert(viaExpr(0) == "a=1&b=2" && viaExpr(1) == "" && viaExpr(2) == "a=1")
    assert(viaExpr(3) == "" && viaExpr(4) == "" && viaExpr(6) == "a&x&x")
    assert(viaExpr(10) == "UTMZ=keep") // utm_ is a PREFIX rule, utmz is not
  }

  test("domainConcentration: hand-computed HHI, top share, Gini") {
    // domains: a.com ×4, b.com ×1 → shares (0.8, 0.2)
    // HHI = 0.64 + 0.04 = 0.68; top = 0.8
    // Gini (asc ranks: b=1×1, a=2×4): (2·9 − 3·5)/(2·5) = 3/10 = 0.3
    val df = (0L until 5L).toDF("id")
      .withColumn("url",
        when(col("id") < 4, lit("http://x.a.com/p")).otherwise(
          lit("http://y.b.com/p")))
    val got = Url.domainConcentration(df, "url").head()
    assert(got.getLong(0) == 2L && got.getLong(1) == 5L)
    assert(got.getDouble(2) == 0.68)
    assert(got.getDouble(3) == 0.8)
    assert(got.getDouble(4) == 0.3)
  }

  test("robotsFilter: longest match wins, Allow beats Disallow on ties, " +
    "no rule / no robots row → allowed") {
    val urls = Seq(
      (1L, "http://h.com/private/x"), // Disallow: /private → blocked
      (2L, "http://h.com/private/ok/y"), // longer Allow wins → allowed
      (3L, "http://h.com/pub/z"), // no matching rule → allowed
      (4L, "http://h.com/dual/a"), // equal-length Allow vs Disallow → Allow
      (5L, "http://other.com/private/x") // no robots row → allowed
    ).toDF("id", "url")
    val robots = Seq(("h.com",
      "User-agent: *\nDisallow: /private\nAllow: /private/ok\n" +
        "Disallow: /dual/\nAllow: /dual/\nDisallow:\n# c")).toDF("h", "txt")
    val got = Url.robotsFilter(urls, robots, "id", "url", "h", "txt")
      .orderBy("id").select("id", "allowed", "matched_rule").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(0, 1, 1, 1, 1))
    assert(got(0).getString(2) == "/private")
    assert(got(1).getString(2) == "/private/ok")
    assert(got(2).isNullAt(2) && got(4).isNullAt(2))
    assert(got(3).getString(2) == "/dual/")
  }

  test("domainCap passes small domains through whole") {
    val df = (0L until 4L).toDF("id")
      .withColumn("url", concat(lit("https://tiny"), col("id").cast("string"),
        lit(".org/")))
    assert(Url.domainCap(df, "id", "url", cap = 3).count() === 4L)
  }
}
