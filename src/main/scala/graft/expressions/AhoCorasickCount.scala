package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via an Aho–Corasick automaton —
  * the blocklist/policy-screen engine at corpus scale: ALL patterns are
  * matched in ONE pass over the text (O(|text| + matches), independent
  * of pattern count), vs the per-pattern `contains`/`instr` scan that
  * is O(|text|·|patterns|) and the token-explode join (q201) that
  * cannot see substrings or phrases at all. Returns one count per
  * pattern (order = constructor order), counting OVERLAPPING
  * occurrences at their end positions — "at" inside "ation" is a hit
  * for both, which is what a screen wants (dict-suffix output links
  * make nested patterns free).
  *
  * The automaton is built once on the driver (goto trie + BFS failure
  * links + flattened output lists) and ships to executors as a plan
  * reference object — the FeistelPos/pinned-index posture: plan-time
  * constants, zero per-row setup. Null text → null.
  *
  * The DENSE count array this expression returns is O(|patterns|) per
  * ROW — right for small policy sets (capped at 1024), wrong for
  * production blocklists. Above that, use [[AhoCorasickHits]]: sparse
  * `(pattern_idx, n)` pairs, output proportional to actual matches. */
case class AhoCorasickCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.size <= 1024,
    s"need 1..1024 patterns (dense per-row output — use AhoCorasickHits " +
      s"beyond that), got ${patterns.size}")
  require(patterns.forall(_.nonEmpty), "empty pattern")
  require(patterns.map(_.length).sum <= 65536, "pattern set too large")

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "aho_corasick_count"

  @transient private lazy val matcher = new AhoCorasickMatcher(patterns.toArray)

  override def nullSafeEval(text: Any): Any =
    matcher.count(text.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acMatcher", matcher,
      classOf[AhoCorasickMatcher].getName)
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = $ref.count($text.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SPARSE variant of [[AhoCorasickCount]] for production-scale pattern
  * sets (capped at 65536 patterns / 2^20 total chars, both measured —
  * see the round-10 README table): returns only the patterns that
  * actually occur, as `(pid, n)` structs with `pid = idxBase + local
  * index`. Per-row output is O(distinct matching patterns), not
  * O(|patterns|), which is what lets a 10k–100k blocklist screen
  * stream through one Generate. `idxBase` exists for SHARDING: when a
  * pattern set exceeds the per-kernel cap, the caller splits it into
  * consecutive shards, each kernel emits globally-indexed hits, and
  * `concat` of the shard outputs feeds ONE explode
  * ([[graft.ops.TextAnalysis.blocklistScreen]]). */
case class AhoCorasickHits(
    child: Expression,
    patterns: Seq[String],
    idxBase: Int = 0)
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.size <= 65536,
    s"need 1..65536 patterns per kernel (shard above), got ${patterns.size}")
  require(patterns.forall(_.nonEmpty), "empty pattern")
  require(patterns.map(_.length).sum <= (1 << 20),
    "pattern set too large for one kernel (shard above)")
  require(idxBase >= 0, "idxBase must be >= 0")

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pid", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "aho_corasick_hits"

  @transient private lazy val matcher = new AhoCorasickMatcher(patterns.toArray)

  override def nullSafeEval(text: Any): Any =
    matcher.hits(text.asInstanceOf[UTF8String].toString, idxBase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acMatcher", matcher,
      classOf[AhoCorasickMatcher].getName)
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = $ref.hits($text.toString(), $idxBase);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The built automaton, FLATTENED for the match loop: the driver builds
  * the goto trie + BFS failure links on boxed maps (build cost is
  * one-off, O(total pattern chars)), then compiles them into primitive
  * arrays — CSR transitions sorted by char per state (binary-search
  * lookup, no boxing, cache-local) with a DENSE 65536-entry next-state
  * row for the root (where nearly every failure walk lands), and CSR
  * output-pattern lists. The per-char cost is a handful of char
  * compares against unboxed arrays instead of a boxed
  * `HashMap[Char, Int]` probe per char plus per failure hop (the
  * round-9 ADVICE finding — measured 2.2–7.3× single-thread over the
  * boxed matcher at 1k–100k patterns, 4.4× at the 10k screen;
  * [[graft.tools.AcBench]] reproduces the table). Serializable so the
  * plan can ship it — measured 0.57 MB at 10k patterns / 3.6 MB at
  * 100k, built in ~60/~210 ms on the driver. */
class AhoCorasickMatcher(patterns: Array[String]) extends Serializable {
  // ── build: boxed trie, driver-side only ──
  private val gotoMaps = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.HashMap.empty[Char, Int])
  private val outBuf = scala.collection.mutable.ArrayBuffer(List.empty[Int])

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

  private val nStates = gotoMaps.size
  private val fail = new Array[Int](nStates)

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

  // ── flatten: CSR transitions (sorted by char) + dense root row ──
  private val stateOff = new Array[Int](nStates + 1)
  private val tChar: Array[Char] = {
    var total = 0
    var s = 0
    while (s < nStates) {
      stateOff(s) = total; total += gotoMaps(s).size; s += 1
    }
    stateOff(nStates) = total
    new Array[Char](total)
  }
  private val tTo = new Array[Int](tChar.length)
  locally {
    var s = 0
    while (s < nStates) {
      val entries = gotoMaps(s).toArray.sortBy(_._1)
      var i = 0
      while (i < entries.length) {
        tChar(stateOff(s) + i) = entries(i)._1
        tTo(stateOff(s) + i) = entries(i)._2
        i += 1
      }
      s += 1
    }
  }
  /** Dense next-state row for the root: rootNext(c) = goto(0, c), or 0
    * (stay at root). 256 KiB per automaton — one array, not per-state. */
  private val rootNext: Array[Int] = {
    val a = new Array[Int](65536)
    for ((c, v) <- gotoMaps(0)) a(c) = v
    a
  }
  private val outOff = new Array[Int](nStates + 1)
  private val outPat: Array[Int] = {
    var total = 0
    var s = 0
    while (s < nStates) { outOff(s) = total; total += outBuf(s).size; s += 1 }
    outOff(nStates) = total
    val a = new Array[Int](total)
    s = 0
    while (s < nStates) {
      var i = outOff(s)
      for (p <- outBuf(s)) { a(i) = p; i += 1 }
      s += 1
    }
    a
  }
  // the boxed build structures are dead after flattening; drop them so
  // the serialized plan ships only the primitive arrays
  gotoMaps.clear()
  outBuf.clear()

  private val nPat = patterns.length

  /** Number of trie states (diagnostics / AcBench). */
  def numStates: Int = nStates

  /** Binary search for state `s`'s transition on `c`; -1 if absent. */
  private def lookup(s: Int, c: Char): Int = {
    var lo = stateOff(s)
    var hi = stateOff(s + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = tChar(mid)
      if (mc == c) return tTo(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** One automaton step: follow goto, walking failure links on miss;
    * the root resolves through the dense row (no failure loop). */
  private def step(s0: Int, c: Char): Int = {
    var s = s0
    while (s != 0) {
      val nxt = lookup(s, c)
      if (nxt >= 0) return nxt
      s = fail(s)
    }
    rootNext(c)
  }

  /** Counts of every pattern (overlapping, end-position) in one pass. */
  def count(text: String): GenericArrayData = {
    val counts = new Array[Long](nPat)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      var j = outOff(s)
      val end = outOff(s + 1)
      while (j < end) { counts(outPat(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Per-task scratch for the sparse pass: a counts array reused across
    * rows plus the list of touched pattern indexes — O(matches) per row
    * after the one-off allocation, never O(nPat) per row. */
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Long], Array[Int])] {
      override def initialValue(): (Array[Long], Array[Int]) =
        (new Array[Long](nPat), new Array[Int](nPat))
    }

  /** Sparse `(idxBase + pattern_idx, n)` pairs for patterns with n > 0,
    * ascending by index — one pass, output O(distinct matches). */
  def hits(text: String, idxBase: Int): GenericArrayData = {
    val (counts, touched) = scratch.get()
    var nTouched = 0
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      var j = outOff(s)
      val end = outOff(s + 1)
      while (j < end) {
        val p = outPat(j)
        if (counts(p) == 0L) { touched(nTouched) = p; nTouched += 1 }
        counts(p) += 1
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(touched, 0, nTouched)
    val rows = new Array[Any](nTouched)
    var t = 0
    while (t < nTouched) {
      val p = touched(t)
      rows(t) = new GenericInternalRow(
        Array[Any](idxBase + p, counts(p)))
      counts(p) = 0L // reset for the next row
      t += 1
    }
    new GenericArrayData(rows)
  }
}
