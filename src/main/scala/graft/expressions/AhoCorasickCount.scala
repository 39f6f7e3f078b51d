package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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
  * constants, zero per-row setup. Null text → null. */
case class AhoCorasickCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.size <= 256,
    s"need 1..256 patterns, got ${patterns.size}")
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

/** The built automaton: goto per state (char-keyed), failure links,
  * flattened per-state output pattern indexes. Built eagerly in the
  * constructor; serializable so the plan can ship it. */
class AhoCorasickMatcher(patterns: Array[String]) extends Serializable {
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
  def count(text: String): GenericArrayData = {
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
    new GenericArrayData(counts)
  }
}
