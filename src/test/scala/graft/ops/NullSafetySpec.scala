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

  test("repetitionStats and bigramLmScore are total on degenerate docs") {
    val rep = TextAnalysis.repetitionStats(degenerate, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rep.keySet == Set(1L, 2L, 3L, 4L, 5L)) // every doc present
    assert(rep(1L) == ((0.0, 0.0, 1.0)))          // null text -> empty stats
    assert(rep(2L) == ((0.0, 0.0, 1.0)))
    assert(rep(5L) == ((0.25, 0.333333, 1.0)))    // all-distinct doc, 6dp
    val lm = TextAnalysis.bigramLmScore(degenerate, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lm.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(lm(1L) == 0.0 && lm(2L) == 0.0 && lm(3L) == 0.0) // no bigrams
    assert(lm(4L) > 0.0 && lm(5L) > 0.0)
  }

  test("piiScrub: null text propagates null counts/output; blank passes through") {
    val got = TextAnalysis.piiScrub(degenerate, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.isNullAt(1), r.isNullAt(4), Option(r.getString(4))))).toMap
    assert(got(1L) == ((true, true, None)))        // null in, null out — never invented text
    assert(got(2L) == ((false, false, Some("")))) // empty in, empty out
    assert(got(3L)._3.contains("   "))            // whitespace untouched
  }

  test("chunkDocs: null/empty/blank docs emit no chunks") {
    val chunks = TextAnalysis.chunkDocs(degenerate, "doc_id", "text",
      chunkTokens = 4, overlap = 1)
    assert(chunks.filter(col("doc_id").isin(1L, 2L, 3L)).count() == 0)
    // and a doc shorter than one chunk still emits its single chunk
    assert(chunks.filter(col("doc_id") === 4L).count() == 1)
  }

  test("decontaminate: null/empty docs have no n-grams, so they always survive") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val clean = Dedup.decontaminate(degenerate, bench, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    // doc 5 shares its 3-grams with the bench doc; 1-4 have no 3-grams
    assert(clean == Set(1L, 2L, 3L, 4L))
  }

  test("segmentDedup / dropFrequentSegments: null/empty/blank docs drop out, token docs survive") {
    for (out <- Seq(
        Dedup.segmentDedup(degenerate, "doc_id", "text", segWords = 3),
        Dedup.dropFrequentSegments(degenerate, "doc_id", "text", 3, 2))) {
      val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // docs 1-3 have no tokens: excluded from segmentation (not emitted
      // as empty rows); 4 and 5 reassemble verbatim (nothing duplicated)
      assert(m.keySet == Set(4L, 5L))
      assert(m(4L) == "one two")
      assert(m(5L) == "alpha beta gamma delta")
    }
  }

  test("quantizeInt8 / labelCentroids: null and empty vectors stay null, never crash") {
    val vecs = Seq(
      (1L, 0, Array(1f, 2f)),
      (2L, 0, null.asInstanceOf[Array[Float]]),
      (3L, 1, Array[Float]())
    ).toDF("vec_id", "label", "embedding")
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!q(1L) && q(2L) && q(3L)) // null/empty -> null mn, no exception
    val c = Similarity.labelCentroids(vecs, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // null/empty vectors explode to nothing: label 1 has no rows at all
    assert(c.keySet == Set((0, 0), (0, 1)))
    assert(c((0, 0)) == 1.0 && c((0, 1)) == 2.0)
  }

  test("exactGroups groups all empty-normalized docs together (documented)") {
    val key = md5(concat_ws(" ", array_sort(array_distinct(col("toks")))))
    val g = Dedup.exactGroups(degenerate, "doc_id", key).collect()
    // null/blank docs share the empty normalized stream -> one group
    assert(g.length == 1 && g.head.getAs[String]("member_ids") == "1;2;3")
  }
}
