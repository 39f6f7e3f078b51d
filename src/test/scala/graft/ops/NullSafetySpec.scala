package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the behavior of text/dedup operators on degenerate inputs (null
  * text, empty text, sub-shingle-length docs) — corpus data at scale
  * always contains them, and silent null-propagation differences are how
  * engines diverge. */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private def degenerate = Seq(
    (1L, null.asInstanceOf[String]),
    (2L, ""),
    (3L, "   "),
    (4L, "one two"), // < 3 tokens: no 3-gram shingles
    (5L, "alpha beta gamma delta")
  ).toDF("doc_id", "text")
    .withColumn("toks", TextAnalysis.words(col("text")))

  test("words: null -> null, blank -> empty array") {
    val m = degenerate.select(col("doc_id"), col("toks")).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(m(1L).isEmpty) // null text -> null tokens
    assert(m(2L).contains(Seq()))
    assert(m(3L).contains(Seq()))
  }

  test("shingles of null/short docs produce no pairs anywhere") {
    val sh = Dedup.shingles(col("toks"), 3)
    // jaccard: only doc 5 could shingle, and it has no partner -> no pairs
    assert(Dedup.jaccardPairs(degenerate, "doc_id", sh, 0.0).count() == 0)
    // minhash: docs without shingles drop out of signatures entirely
    assert(Dedup.minhashPairs(degenerate, "doc_id", sh).count() == 0)
  }

  test("simhash drops token-less docs instead of colliding them") {
    val fps = Dedup.simhash(degenerate, "doc_id", col("toks"))
      .collect().map(_.getLong(0)).toSet
    assert(fps == Set(4L, 5L)) // only docs with tokens have fingerprints
  }

  test("langId and quality are total on degenerate docs") {
    val r = degenerate.select(col("doc_id"),
        TextAnalysis.langId(col("toks")).as("lang"),
        TextAnalysis.avgWordLen(col("toks")).as("awl"))
      .collect().map(x => x.getLong(0) -> (x.getString(1), Option(x.get(2)))).toMap
    assert(r(2L)._1 == "und" && r(2L)._2.contains(0.0))
    assert(r(3L)._1 == "und")
    assert(r(5L)._1 == "und") // no stopwords in the synthetic words
  }

  test("exactGroups groups all empty-normalized docs together (documented)") {
    val key = md5(concat_ws(" ", array_sort(array_distinct(col("toks")))))
    val g = Dedup.exactGroups(degenerate, "doc_id", key).collect()
    // null/blank docs share the empty normalized stream -> one group
    assert(g.length == 1 && g.head.getAs[String]("member_ids") == "1;2;3")
  }
}
