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

  test("domainCap passes small domains through whole") {
    val df = (0L until 4L).toDF("id")
      .withColumn("url", concat(lit("https://tiny"), col("id").cast("string"),
        lit(".org/")))
    assert(Url.domainCap(df, "id", "url", cap = 3).count() === 4L)
  }
}
