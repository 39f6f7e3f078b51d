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
