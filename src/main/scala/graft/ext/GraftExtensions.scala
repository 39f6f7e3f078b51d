package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{HilbertIndex, NfcNormalize, VecDot}

/** SparkSessionExtensions hook registering graft's native expressions for
  * SQL use (`SELECT vec_dot(a.embedding, b.embedding) ...`).
  *
  * Enable per session:
  *   SparkSession.builder.withExtensions(GraftExtensions)  — or —
  *   spark.sql.extensions=graft.ext.GraftExtensions
  *
  * The DataFrame API path ([[graft.ops.Similarity.dot]]) constructs the
  * expression directly and does not require the extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    // hilbert_index(x, y[, bits]) — bits must be a foldable int literal
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (children: Seq[Expression]) => {
        val bits = children.lift(2) match {
          case Some(b) => b.eval().asInstanceOf[Number].intValue()
          case None => 16
        }
        HilbertIndex(children.head, children(1), bits)
      }))
    // whole-operator extension: plans graft.plans.TopKPerKeyNode (sort-free
    // top-k per key) into its bounded-heap physical operator
    ext.injectPlannerStrategy(_ => new graft.plans.GraftStrategies)
    // optimizer extension: the row_number + rank-filter + drop(rn) idiom
    // rewrites to TopKPerKeyNode automatically — users write the naive
    // window formulation and get the sort-free plan
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
  }
}

object GraftExtensions extends GraftExtensions
