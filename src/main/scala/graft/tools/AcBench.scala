package graft.tools

import java.io.{ByteArrayOutputStream, ObjectOutputStream}

import graft.expressions.AhoCorasickMatcher

/** Measures the Aho–Corasick automaton at production pattern scales —
  * the numbers that justify the kernel caps (65536 patterns / 2^20
  * chars per kernel) instead of guessing them: driver build+flatten
  * time, java-serialized size (what the plan ships per stage), and
  * per-row match throughput on a ~2 KB document. Run:
  *
  *   sbt "runMain graft.tools.AcBench"
  *
  * Pattern sets are deterministic k-grams over a 10-char alphabet
  * (4-grams → 10^4, plus 5-gram slices for the larger counts), matched
  * against a repeated English-ish line, so runs are reproducible. */
object AcBench {
  def main(args: Array[String]): Unit = {
    val alpha = "etaonis rh"
    val g4 = (for (a <- alpha; b <- alpha; c <- alpha; d <- alpha)
      yield s"$a$b$c$d").toArray
    val g5 = (for (a <- alpha; b <- alpha; c <- alpha; d <- alpha; e <- alpha)
      yield s"$a$b$c$d$e").toArray
    val doc = ("the rain in spain stays mainly on the plain and " +
      "a nation of stations rations operations near the east coast ") * 20
    println(s"doc length: ${doc.length} chars")
    println("patterns | states | build_ms | ser_bytes | rows/s (1 thread)")
    for (n <- Seq(1000, 10000, 50000, 100000)) {
      val pats =
        if (n <= g4.length) g4.take(n)
        else g4 ++ g5.take(n - g4.length)
      val t0 = System.nanoTime()
      val m = new AhoCorasickMatcher(pats)
      val buildMs = (System.nanoTime() - t0) / 1e6
      val bos = new ByteArrayOutputStream()
      val oos = new ObjectOutputStream(bos)
      oos.writeObject(m)
      oos.close()
      val serBytes = bos.size()
      // warm up, then time the sparse pass (the screen's hot path)
      var i = 0
      while (i < 200) { m.hits(doc, 0); i += 1 }
      val reps = 2000
      val t1 = System.nanoTime()
      i = 0
      while (i < reps) { m.hits(doc, 0); i += 1 }
      val rowsPerSec = reps / ((System.nanoTime() - t1) / 1e9)
      // baseline arm: the round-9 boxed-HashMap matcher, same pattern set
      val mOld = new BoxedReferenceMatcher(pats)
      var w = 0
      while (w < 50) { mOld.count(doc); w += 1 }
      val repsOld = 300
      val t2 = System.nanoTime()
      w = 0
      while (w < repsOld) { mOld.count(doc); w += 1 }
      val oldRowsPerSec = repsOld / ((System.nanoTime() - t2) / 1e9)
      println(f"$n%8d | ${m.numStates}%6d | $buildMs%8.1f | $serBytes%9d | " +
        f"$rowsPerSec%8.0f | boxed $oldRowsPerSec%7.0f (${rowsPerSec / oldRowsPerSec}%.1fx)")
    }
  }
}

/** The round-9 boxed-HashMap matcher, kept VERBATIM (modulo the return
  * type) as the measurement baseline for the flattening — the "before"
  * arm of the throughput table above. Not used by any operator. */
class BoxedReferenceMatcher(patterns: Array[String]) extends Serializable {
  private val gotoMaps = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.HashMap.empty[Char, Int])
  private val outBuf = scala.collection.mutable.ArrayBuffer(List.empty[Int])

  // trie
  for (p <- patterns.indices) {
    var s = 0
    for (c <- patterns(p)) {
      s = gotoMaps(s).getOrElseUpdate(c, {
        gotoMaps += scala.collection.mutable.HashMap.empty[Char, Int]
        outBuf += Nil
        gotoMaps.size - 1
      })
    }
    outBuf(s) = p :: outBuf(s)
  }

  private val fail = new Array[Int](gotoMaps.size)
  // BFS failure links; output lists flatten through them
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    for ((_, s) <- gotoMaps(0)) { fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- gotoMaps(u)) {
        queue += v
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
        fail(v) = gotoMaps(f).get(c).filter(_ != v).getOrElse(0)
        outBuf(v) = outBuf(v) ++ outBuf(fail(v))
      }
    }
  }

  private val out: Array[Array[Int]] = outBuf.map(_.toArray).toArray
  private val nPat = patterns.length

  /** Counts of every pattern (overlapping, end-position) in one pass. */
  def count(text: String): Array[Long] = {
    val counts = new Array[Long](nPat)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      while (s != 0 && !gotoMaps(s).contains(c)) s = fail(s)
      s = gotoMaps(s).getOrElse(c, 0)
      val os = out(s)
      var j = 0
      while (j < os.length) { counts(os(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

