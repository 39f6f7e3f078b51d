package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per key WITHOUT a sort.
  *
  * Spark plans "top-k per group" (rank window + filter) as
  * Exchange → full partition SORT → Window → Filter: every row in every
  * partition is sorted even though only k per key survive. This operator
  * keeps the same exchange but replaces sort+window+filter with one pass
  * maintaining a bounded heap per key — O(n log k) comparisons instead of
  * O(n log n). At 100 TB "top 5 documents per domain by quality" is
  * exactly this shape, and the partition sort is the bottleneck.
  *
  * MEMORY BOUND — the heap pass retains up to `keys-per-partition · k`
  * rows in plain JVM memory (it is the operator's own output, so it is
  * irreducible for a hash-based formulation). That bound is fine for the
  * intended "few survivors per key, many rows per key" shape, but a
  * pathological input (near-distinct keys, so output ≈ input) would OOM
  * where the sort+window formulation spills. Guard: when retained rows
  * exceed `spark.graft.topKPerKey.maxRowsInMemory` (default 4M rows) the
  * partition FALLS BACK to external sort-based processing — the retained
  * heaps plus all remaining input are sorted into bounded spill runs on
  * (key bytes, ordering) and merged streaming, emitting the first k rows
  * per key with memory O(maxRowsInMemory + #runs). Results are identical
  * either way.
  *
  * The full custom-operator ladder, as SparkSessionExtensions wires it:
  * [[TopKPerKeyNode]] (logical) is planned by [[GraftStrategies]]
  * (injected via `injectPlannerStrategy`) into [[TopKPerKeyExec]]
  * (physical), whose `requiredChildDistribution` makes EnsureRequirements
  * insert the same hash exchange the window formulation pays — the sort
  * is the only thing removed. Results are bit-identical to the window
  * formulation whenever `ordering` is a total order (ties broken by a
  * unique column), which callers should always provide.
  */
case class TopKPerKeyNode(
    k: Int,
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  // same clustering the window formulation needs — rows of one key meet
  // in one partition; EnsureRequirements inserts the hash exchange
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyE = keyExprs
    val ordE = ordering
    val childOutput = child.output
    // spill threshold in retained rows; resolved on the driver so the
    // session's runtime conf value ships with the closure
    val maxInMem = conf
      .getConfString("spark.graft.topKPerKey.maxRowsInMemory", (1 << 22).toString)
      .toInt
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyE, childOutput)
      // codegen'd comparator; compare(a, b) < 0 ⇔ a wins over b
      val ord = GenerateOrdering.generate(ordE, childOutput)
      // per-key max-heap of the current k: the WORST survivor is at the
      // head, so each losing row costs one comparison and no allocation
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      var retained = 0L
      var overflow = false
      while (it.hasNext && !overflow) {
        val row = it.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
            retained += 1
          case Some(h) =>
            if (h.size < kLocal) { h.enqueue(row.copy()); retained += 1 }
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue()
              h.enqueue(row.copy())
            }
        }
        if (retained > maxInMem) overflow = true
      }
      if (!overflow) heaps.valuesIterator.flatMap(_.iterator)
      else {
        // ── sort-based fallback: heap state + remaining input → bounded
        // sorted spill runs on (key bytes, ordering) → streaming merge
        // emitting the first k per key. Equal keys have equal UnsafeRow
        // bytes, so byte order groups exactly like the hash map did.
        System.err.println(
          s"TopKPerKeyExec: retained rows exceeded $maxInMem " +
            "(spark.graft.topKPerKey.maxRowsInMemory); falling back to " +
            "external sort-based top-k for this partition")
        TopKSpill.sortBased(
          it, heaps, keyProj, ord, childOutput, kLocal, maxInMem)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** External-sort fallback for [[TopKPerKeyExec]] — package-private so the
  * spec can exercise it directly with a tiny threshold. */
private[graft] object TopKSpill {

  private final class Entry(val keyBytes: Array[Byte], val row: UnsafeRow)

  def sortBased(
      rest: Iterator[InternalRow],
      heaps: scala.collection.mutable.HashMap[
        UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]],
      keyProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      childOutput: Seq[Attribute],
      k: Int,
      chunkRows: Int): Iterator[InternalRow] = {
    val numFields = childOutput.size
    val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
    val cmp = new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.util.Arrays.compareUnsigned(a.keyBytes, b.keyBytes)
        if (c != 0) c else ord.compare(a.row, b.row)
      }
    }
    val spillFiles = ArrayBuffer.empty[File]
    // a consumer may stop pulling early (limit above the operator), so the
    // run readers register here and the completion listener closes them
    // before deleting — otherwise each partially-read run leaks an fd and
    // pins its deleted file's disk space until GC
    val openStreams = ArrayBuffer.empty[java.io.Closeable]
    val ctx = TaskContext.get()
    if (ctx != null) {
      ctx.addTaskCompletionListener[Unit] { _ =>
        openStreams.foreach(s => try s.close() catch { case _: Exception => })
        spillFiles.foreach(_.delete())
      }
    }
    // spill where Spark spills: the executor's configured local dirs
    // (often large scratch disks) rather than java.io.tmpdir (often a
    // small root volume exactly when the fallback is needed)
    val spillDir: File = {
      val dirs = sys.env.get("SPARK_LOCAL_DIRS")
        .orElse(Option(org.apache.spark.SparkEnv.get)
          .flatMap(e => Option(e.conf.get("spark.local.dir", null))))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty))
        .getOrElse(Array.empty[String])
      val pid = if (ctx != null) ctx.partitionId() else 0
      val d = if (dirs.isEmpty) new File(System.getProperty("java.io.tmpdir"))
        else new File(dirs(pid % dirs.length))
      d.mkdirs()
      d
    }

    def spillRun(buf: ArrayBuffer[Entry]): Unit = {
      val arr = buf.toArray
      java.util.Arrays.sort(arr, cmp)
      val f = File.createTempFile("graft_topk_spill_", ".bin", spillDir)
      spillFiles += f
      val out = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
      try {
        out.writeInt(arr.length)
        val scratch = new Array[Byte](1 << 12)
        arr.foreach { e =>
          out.writeInt(e.keyBytes.length)
          out.write(e.keyBytes)
          out.writeInt(e.row.getSizeInBytes)
          e.row.writeToStream(out, scratch)
        }
      } finally out.close()
      buf.clear()
    }

    def readRun(f: File): Iterator[Entry] = new Iterator[Entry] {
      private val in = new DataInputStream(
        new BufferedInputStream(new FileInputStream(f), 1 << 16))
      openStreams += in
      private var remaining = in.readInt()
      override def hasNext: Boolean = {
        if (remaining <= 0) in.close()
        remaining > 0
      }
      override def next(): Entry = {
        val kb = new Array[Byte](in.readInt())
        in.readFully(kb)
        val rb = new Array[Byte](in.readInt())
        in.readFully(rb)
        val r = new UnsafeRow(numFields)
        r.pointTo(rb, rb.length)
        remaining -= 1
        new Entry(kb, r)
      }
    }

    // current heap state becomes the first chunk's seed rows
    val buf = ArrayBuffer.empty[Entry]
    heaps.foreach { case (key, h) =>
      val kb = key.getBytes
      h.foreach(r => buf += new Entry(kb, toUnsafe(r).copy()))
    }
    heaps.clear()
    if (buf.length >= chunkRows) spillRun(buf)
    rest.foreach { row =>
      // keyProj reuses one output buffer, and getBytes on an exactly-sized
      // UnsafeRow returns that backing array UNCOPIED — copy() first so
      // each entry owns its key bytes
      buf += new Entry(keyProj(row).copy().getBytes, toUnsafe(row).copy())
      if (buf.length >= chunkRows) spillRun(buf)
    }
    val lastChunk = buf.toArray
    java.util.Arrays.sort(lastChunk, cmp)

    // k-way merge of the sorted runs, then first-k-per-key streaming
    val runs: Array[scala.collection.BufferedIterator[Entry]] =
      (spillFiles.map(readRun) :+ lastChunk.iterator).map(_.buffered).toArray
    val runOrder = new java.util.Comparator[Int] {
      override def compare(a: Int, b: Int): Int = cmp.compare(runs(a).head, runs(b).head)
    }
    val pq = new java.util.PriorityQueue[Int](math.max(1, runs.length), runOrder)
    runs.indices.foreach(i => if (runs(i).hasNext) pq.add(i))
    val merged: Iterator[Entry] = new Iterator[Entry] {
      override def hasNext: Boolean = !pq.isEmpty
      override def next(): Entry = {
        val i = pq.poll()
        val e = runs(i).next()
        if (runs(i).hasNext) pq.add(i)
        e
      }
    }
    new Iterator[InternalRow] {
      private var curKey: Array[Byte] = null
      private var emitted = 0
      private var pending: InternalRow = advance()
      private def advance(): InternalRow = {
        while (merged.hasNext) {
          val e = merged.next()
          if (curKey == null || !java.util.Arrays.equals(curKey, e.keyBytes)) {
            curKey = e.keyBytes
            emitted = 1
            return e.row
          } else if (emitted < k) {
            emitted += 1
            return e.row
          }
          // else: beyond top-k for this key — skip
        }
        null
      }
      override def hasNext: Boolean = pending != null
      override def next(): InternalRow = {
        val r = pending
        pending = advance()
        r
      }
    }
  }
}

/** Planner strategy turning [[TopKPerKeyNode]] into [[TopKPerKeyExec]];
  * injected per session through `SparkSessionExtensions
  * .injectPlannerStrategy` (graft.ext.GraftExtensions). */
class GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, ord, child) =>
      TopKPerKeyExec(k, keys, ord, planLater(child)) :: Nil
    case _ => Nil
  }
}
