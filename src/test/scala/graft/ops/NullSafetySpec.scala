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

  test("dictionaryTag / featureHash / charEntropy drop token-less docs, never null-row") {
    val dict = Map("x" -> Seq("alpha", "beta"))
    val tag = TextAnalysis.dictionaryTag(degenerate, "doc_id", "text", dict)
      .collect().map(_.getLong(0)).toSet
    assert(tag == Set(5L), tag.toString) // only doc 5 hits; no null rows
    val fh = TextAnalysis.featureHash(degenerate, "doc_id", "text", 8)
      .collect().map(_.getLong(0)).toSet
    assert(fh == Set(4L, 5L), fh.toString) // token-less docs emit nothing
    val ce = TextAnalysis.charEntropy(degenerate, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // null text -> no chars -> absent; whitespace-only still has chars
    assert(!ce.contains(1L) && !ce.contains(2L), ce.toString)
    assert(ce(3L) == 0.0, ce.toString) // "   " = one char class, H = 0
  }

  test("containmentPairs: null/short docs never pair; thresholds are post-round") {
    val sh = Dedup.shingles(col("toks"), 3)
    val got = Dedup.containmentPairs(degenerate, "doc_id", sh, 0.0)
    assert(got.count() == 0) // only doc 5 shingles; no partner
  }

  test("targetEncode: null y rows keep their row but don't contribute to sums") {
    val df = Seq(("a", Some(1.0)), ("a", Some(0.0)), ("a", None), ("b", Some(1.0)))
      .map { case (c, y) => (c, y.map(Double.box).orNull) }
      .toDF("cat", "y")
    val got = Models.targetEncode(df, "cat", "y", m = 0.0)
      .collect().map(r => (r.getString(0), Option(r.get(1))) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // count(y)/sum(y) skip nulls: a's non-null rows see n=2 -> LOO n-1=1
    assert(got(("a", Some(1.0))).contains(0.0)) // (1 - 1 + 0)/(2 - 1)
    assert(got(("a", Some(0.0))).contains(1.0)) // (1 - 0)/(1)
    // the null-y row's own enc is null (y enters the numerator), row kept
    assert(got.contains(("a", None)) && got(("a", None)).isEmpty)
    // m = 0 + singleton b: LOO denominator 0 -> null, never an ANSI error
    assert(got.contains(("b", Some(1.0))) && got(("b", Some(1.0))).isEmpty)
  }

  test("importanceResample/vocabCoverage/contrastive are total on degenerate corpora") {
    // empty TARGET slice: the smoothed target distribution is uniform
    // (1/(0+B) per bucket) — weights still compute, nothing errors
    val ir = TextAnalysis.importanceResample(degenerate, "doc_id", "text",
      lit(false), nBuckets = 8, k = 10).collect()
    assert(ir.nonEmpty && ir.forall(r => !r.isNullAt(1)), ir.mkString(", "))
    // token-less docs carry no buckets -> absent from the ranking
    assert(!ir.map(_.getLong(0)).toSet.exists(Set(1L, 2L, 3L)), ir.mkString(", "))
    // vocabCoverage over a corpus with null/blank docs: totals count only
    // real tokens; budgets beyond the vocab saturate at 1.0
    val vc = TextAnalysis.vocabCoverage(degenerate, "text", Seq(1, 1000))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(vc(1000) == 1.0, vc.toString)
    // no near-dup pair anywhere -> zero triplets, not an error
    assert(TextAnalysis.contrastiveTriplets(degenerate, "doc_id", "text")
      .count() == 0)
  }

  test("adamicAdar: cap that drops every neighbor yields empty, never errors") {
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("s", "c")
    // customer 10 has deg 3 > cap 2 -> no surviving incidence rows
    assert(Graph.adamicAdar(e, "s", "c", maxDegree = 2, minCommon = 1)
      .count() == 0)
    // self-loops and duplicate edges collapse before scoring
    val dup = Seq((1L, 10L), (1L, 10L), (2L, 10L)).toDF("s", "c")
    val got = Graph.adamicAdar(dup, "s", "c", maxDegree = 5, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 1L), got.toString)
  }

  test("windowFunnel/holtLinear: empty/degenerate keys vanish, no level rows lost") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq((1L, ts("2024-01-01 08:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val lv = Temporal.windowFunnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"), expr("INTERVAL 1 HOUR"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // both levels present even though nobody clicks
    assert(lv == Map(1 -> 1L, 2 -> 0L), lv.toString)
    val h = Temporal.holtLinear(
      Seq(("k", java.sql.Date.valueOf("2024-01-01"), 1.0))
        .toDF("k", "d", "v"), "k", "d", "v")
    assert(h.count() == 0) // single point: no init, key drops
  }

  test("naiveBayes: null/empty docs train and score as token-less") {
    val docs = Seq(
      (1L, 1, "good stuff here"), (2L, 0, "bad junk there"),
      (3L, 1, null.asInstanceOf[String]), (4L, 0, "")
    ).toDF("doc_id", "y", "text")
    val model = Models.naiveBayesFit(docs, "text", col("y"), vocabSize = 16)
    val got = Models.naiveBayesScore(docs, model, "doc_id", "text")
      .select("doc_id", "log_odds").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // token-less docs (null + empty) fall back to exactly the prior,
    // which is ln(2/2) = 0 here; every doc still gets a row
    assert(got.size == 4)
    assert(got(3L) == 0.0 && got(4L) == 0.0)
  }

  test("html extraction: null html -> null columns, never an error") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "<p>x</p>"))
      .toDF("id", "h")
    val out = df.select(col("id"), Html.visibleText(col("h")).as("t"),
        Html.title(col("h")).as("ttl"), Html.linkDensity(col("h")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((Some("x"), Some(""))))
  }

  test("kAnonymityAudit: null quasi values form their own cohort") {
    val df = Seq((null.asInstanceOf[String], "s1"),
      (null.asInstanceOf[String], "s2"), ("a", "s1")).toDF("q1", "s")
    val got = Privacy.kAnonymityAudit(df, Seq("q1"), col("s"), k = 2, l = 1)
      .select("q1", "group_size").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got(None) == 2L && got(Some("a")) == 1L)
  }

  test("bradleyTerry: empty pair stream yields an empty leaderboard") {
    val pairs = Seq.empty[(String, String)].toDF("w", "l")
    assert(Models.bradleyTerry(pairs, "w", "l").count() == 0)
  }

  test("bradleyTerry: null-keyed matches drop; ipfMixture survives all-null mass") {
    val pairs = Seq(("A", "B"), (null.asInstanceOf[String], "B"),
      ("A", null.asInstanceOf[String])).toDF("w", "l")
    val got = Models.bradleyTerry(pairs, "w", "l")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("A" -> 1L, "B" -> 1L)) // only the clean match counts
    // a cell whose every mass value is null aggregates as an empty cell
    val df = Seq(("a", "x", Some(3.0)), ("a", "y", None), ("b", "x", Some(2.0)),
      ("b", "y", Some(1.0))).map { case (r, c, m) =>
      (r, c, m.map(Double.box).orNull) }.toDF("r", "c", "m")
    val out = Sampling.ipfMixture(df, "r", "c", col("m"), iters = 5)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2))
      .toMap
    assert(out(("a", "y")) == 0.0)
  }
}
