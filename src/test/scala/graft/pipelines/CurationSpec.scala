package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The curation funnel on a hand-built corpus where every stage has a
  * known victim — first-drop attribution, telescoping counts, and the
  * surviving token mass are all pinned by construction. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 200 English words (passes the quality length arm and carries enough
  // stopword mass), two exact copies, one near-copy, one German doc, one
  // stopword-free doc (quality fails: 0 stop ratio + tiny length)
  private val en = (1 to 40)
    .map(i => s"the data of line $i and the value on it").mkString(" ")

  test("curate: every stage attributes its own drop; counts telescope; token mass matches") {
    val docs = Seq(
      (1L, "srcA", en), // kept (fingerprint keeper)
      (2L, "srcA", en), // exact dup of 1
      (3L, "srcA", en + " extra trailing words here"), // near dup of 1
      (4L, "srcB", "der und das ist ein mit von zu auf die " * 8), // lang
      // passes the en gate (one stopword beats every other language's
      // zero) but scores 0.1 < 0.25 on quality
      (5L, "srcB", "the zz yy xx ww vv uu tt ss rr")
    ).toDF("doc_id", "source", "text")
    val out = CurationPipeline.curate(docs, minQuality = 0.25, minJac = 0.5)
      .collect().map(r => r.getString(0) ->
        (1 to 6).map(r.getLong).toList).toMap

    // srcA: 3 raw; doc2 exact-dropped, doc3 near-dropped, doc1 kept
    assert(out("srcA") == List(3L, 0L, 0L, 1L, 1L, 1L), out.toString)
    // srcB: 2 raw; doc4 lang-dropped, doc5 quality-dropped
    assert(out("srcB") == List(2L, 1L, 1L, 0L, 0L, 0L), out.toString)
    // telescoping: raw = drops + kept (already explicit above), and the
    // surviving token mass is exactly doc1's word count
    val tok = CurationPipeline.curate(docs, 0.25, 0.5)
      .filter(col("source") === "srcA").head().getLong(7)
    assert(tok == 400L, s"tok_kept $tok") // 40 lines x 10 words
  }

  test("curateBalanced: funnel survivors balance across pinned cells with exact quotas") {
    // 8 kept docs (all distinct English, no dups), 2-d embeddings at two
    // well-separated centroids: ids 1-5 -> cell of (0, 10), 6-8 -> cell
    // of (10, 0); one dropped doc (german) must NOT reach the balancer
    // doc-specific content words (w${i}…) keep cross-doc shingle overlap
    // far below the 0.5 near-dup gate; the stopword skeleton still
    // passes the language and quality gates
    val keptText = (1 to 8).map(i =>
      (1 to 40).map(j => s"the w${i}a of w${i}b$j and the w${i}c on w${i}d").mkString(" "))
    val docs = (keptText.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, if (i < 5) "srcA" else "srcB", t)
    } :+ ((9L, "srcB", "der und das ist ein mit von zu auf die " * 8)))
      .toDF("doc_id", "source", "text")
    val cents = Array(Array(0.0, 10.0), Array(10.0, 0.0))
    val emb = (1L to 9L).map { i =>
      val c = if (i <= 5) cents(0) else cents(1)
      (i, Array(c(0).toFloat + i * 0.01f, c(1).toFloat))
    }.toDF("vec_id", "embedding")
    val out = CurationPipeline.curateBalanced(
        docs, emb, minQuality = 0.25, minJac = 0.5, cents, perCell = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // srcA's 5 docs all in cell 0; quota 2 (global per cell) admits 2
    assert(out(("srcA", 0L)) == ((5L, 2L)), out.toString)
    // srcB's kept docs 6-8 in cell 1, quota admits 2; the german doc 9
    // never reaches the balancer
    assert(out(("srcB", 1L)) == ((3L, 2L)), out.toString)
    assert(out.size == 2, out.toString)
  }

  test("curate: thresholds gate the near-dup arm") {
    val docs = Seq(
      (1L, "s", en),
      (2L, "s", en + " extra trailing words here")
    ).toDF("doc_id", "source", "text")
    // a threshold above the est-Jaccard ceiling keeps both docs
    val strict = CurationPipeline.curate(docs, 0.25, minJac = 1.01)
      .head()
    assert(strict.getLong(6) == 2L, strict.toString) // n_kept
    val loose = CurationPipeline.curate(docs, 0.25, minJac = 0.5).head()
    assert(loose.getLong(6) == 1L && loose.getLong(5) == 1L, loose.toString)
  }
}
