package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** RESIDUAL 1-bit coding with a per-vector scale — the IVF-PQ /
  * BQ-with-norm idea applied to the sign tier, for CLUSTERED corpora
  * where raw sign codes collapse: every point in a tight cluster
  * inherits the CENTER's sign pattern, so the raw 1-bit scorer cannot
  * rank within-cluster neighbors (measured on the round-10
  * planted-cluster fixture: recall@5 = 0.287 at spread 0.25 for
  * cell-blocked AND full-scan Hamming — the code, not the candidate
  * generation, is the limit, against an exact-cosine cell ceiling of
  * 1.000).
  *
  * The code for corpus vector v in cell c is `(words, β)`:
  * `words` = packed signs of the micro-integer residual
  * `Rᵢ = round(vᵢ·10⁶) − Cᵢ` (centroids are 6dp-rounded, so
  * `Cᵢ = cᵢ·10⁶` is exact), `β = (Σ|Rᵢ|)/dim` (integer floor
  * division) — the mean residual magnitude that turns the sign vector
  * back into a magnitude estimate `r̂ᵢ = β·signᵢ`. The candidate score
  * approximates the dot product in one cross-cell-COMPARABLE integer:
  *
  *   score = Σ Qᵢ·Cᵢ  +  β · Σ(±Qᵢ)   ≈ 10¹²·(q·c + q·r) = 10¹²·(q·v)
  *
  * (Qᵢ = round(qᵢ·10⁶); the second term is [[AsymSignDot]] on the
  * residual words). A first formulation WITHOUT the q·c term and scale
  * ranked raw cell-mixed residual dots and measured recall@5 ≈ 0 —
  * far-cell probes have large |q−c| and flood the heap; the
  * decomposition is what makes residual codes rankable across probed
  * cells. Everything is exact integer arithmetic from the single
  * float→micro rounding boundary (Spark `round` HALF_UP semantics,
  * replicated bit-for-bit here and replayable by the DuckDB oracle).
  *
  * Why kernels, not Columns: both outputs depend on the per-ROW cell,
  * so a Column formulation indexes a cells×dim literal per dimension
  * term, duplicating the centroid literal subtree dim× (the FeistelPos
  * tree-duplication lesson). Here the micro-centroid table is ONE plan
  * reference object ([[ResidualCoder]], the AhoCorasick posture) and
  * each output is a single generated static call with a tight loop. */
case class ResidualSignPack(
    vec: Expression,
    cell: Expression,
    centroids: Seq[Seq[Double]],
    dim: Int)
    extends BinaryExpression {

  ResidualCoder.validate(centroids, dim)

  override def left: Expression = vec
  override def right: Expression = cell
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    ResidualCoder.checkTypes(prettyName, vec, cell)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "residual_sign_pack"

  @transient private lazy val coder = ResidualCoder.of(centroids, dim, vec)

  override def nullSafeEval(v: Any, c: Any): Any =
    coder.pack(v.asInstanceOf[ArrayData], ResidualCoder.cellOf(c))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualCoder", coder,
      classOf[ResidualCoder].getName)
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = $ref.pack($v, (int) $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cell = newRight)
}

/** `β = (Σ|round(vᵢ·10⁶) − Cᵢ|) / dim` — the per-vector residual
  * scale stored next to [[ResidualSignPack]]'s words (integer floor
  * division; one long per corpus row). */
case class ResidualScale(
    vec: Expression,
    cell: Expression,
    centroids: Seq[Seq[Double]],
    dim: Int)
    extends BinaryExpression {

  ResidualCoder.validate(centroids, dim)

  override def left: Expression = vec
  override def right: Expression = cell
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    ResidualCoder.checkTypes(prettyName, vec, cell)

  override def dataType: DataType = LongType

  override def prettyName: String = "residual_scale"

  @transient private lazy val coder = ResidualCoder.of(centroids, dim, vec)

  override def nullSafeEval(v: Any, c: Any): Any =
    coder.scale(v.asInstanceOf[ArrayData], ResidualCoder.cellOf(c))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualCoder", coder,
      classOf[ResidualCoder].getName)
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = $ref.scale($v, (int) $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cell = newRight)
}

/** `A = Σ round(qᵢ·10⁶)·Cᵢ` — the exact-integer query·centroid term
  * of the residual score, per (query, probed cell) row. */
case class CentroidDot(
    vec: Expression,
    cell: Expression,
    centroids: Seq[Seq[Double]],
    dim: Int)
    extends BinaryExpression {

  ResidualCoder.validate(centroids, dim)

  override def left: Expression = vec
  override def right: Expression = cell
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    ResidualCoder.checkTypes(prettyName, vec, cell)

  override def dataType: DataType = LongType

  override def prettyName: String = "centroid_dot"

  @transient private lazy val coder = ResidualCoder.of(centroids, dim, vec)

  override def nullSafeEval(v: Any, c: Any): Any =
    coder.centroidDot(v.asInstanceOf[ArrayData], ResidualCoder.cellOf(c))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualCoder", coder,
      classOf[ResidualCoder].getName)
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = $ref.centroidDot($v, (int) $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cell = newRight)
}

/** INT8 residual codes — the QUALITY tier above [[ResidualSignPack]]
  * when 1 bit/dim saturates (measured on the planted-cluster fixture:
  * the 1-bit+scale score plateaus at recall@5 ≈ 0.39–0.75 against an
  * exact-cosine cell ceiling of 1.000 — within a tight cluster,
  * neighbor ranking needs residual MAGNITUDES, not just signs). Per
  * corpus row: `s = max|Rᵢ|` and `codeᵢ = round(Rᵢ·127/s) ∈ [−127,127]`
  * packed 8 signed bytes per long; the candidate score is the exact
  * integer
  *
  *   score = 127·Σ QᵢCᵢ + s·Σ Qᵢ·codeᵢ  ≈  127·10¹²·(q·v)
  *
  * — the same ADC decomposition as the 1-bit tier at 8 bits of
  * residual resolution for 4× the 1-bit storage (1 byte/dim, still
  * 4× under float32). */
case class Int8ResidualPack(
    vec: Expression,
    cell: Expression,
    centroids: Seq[Seq[Double]],
    dim: Int)
    extends BinaryExpression {

  ResidualCoder.validate(centroids, dim)

  override def left: Expression = vec
  override def right: Expression = cell
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    ResidualCoder.checkTypes(prettyName, vec, cell)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "int8_residual_pack"

  @transient private lazy val coder = ResidualCoder.of(centroids, dim, vec)

  override def nullSafeEval(v: Any, c: Any): Any =
    coder.packInt8(v.asInstanceOf[ArrayData], ResidualCoder.cellOf(c))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualCoder", coder,
      classOf[ResidualCoder].getName)
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = $ref.packInt8($v, (int) $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cell = newRight)
}

/** `s = max|Rᵢ|` — the per-vector int8 scale ([[Int8ResidualPack]]). */
case class Int8ResidualScale(
    vec: Expression,
    cell: Expression,
    centroids: Seq[Seq[Double]],
    dim: Int)
    extends BinaryExpression {

  ResidualCoder.validate(centroids, dim)

  override def left: Expression = vec
  override def right: Expression = cell
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    ResidualCoder.checkTypes(prettyName, vec, cell)

  override def dataType: DataType = LongType

  override def prettyName: String = "int8_residual_scale"

  @transient private lazy val coder = ResidualCoder.of(centroids, dim, vec)

  override def nullSafeEval(v: Any, c: Any): Any =
    coder.scaleInt8(v.asInstanceOf[ArrayData], ResidualCoder.cellOf(c))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualCoder", coder,
      classOf[ResidualCoder].getName)
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = $ref.scaleInt8($v, (int) $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cell = newRight)
}

/** `Σ Qᵢ·codeᵢ` over 8-per-long packed signed bytes — the int8
  * residual dot ([[Int8ResidualPack]] layout), one static call. */
case class Int8ResidualDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> (packed int8 codes, " +
          s"micro query dims), got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "int8_residual_dot"

  override def nullSafeEval(w: Any, q: Any): Any =
    Int8ResidualDot.score(w.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, q) =>
      s"${ev.value} = graft.expressions.Int8ResidualDot.score($w, $q);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8ResidualDot {
  /** Σ Qᵢ · (signed byte i of the packed words). */
  def score(words: ArrayData, qi: ArrayData): Long = {
    val n = qi.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val b = (words.getLong(i >> 3) >>> ((i & 7) << 3)) & 0xffL
      s += qi.getLong(i) * ((b << 56) >> 56) // sign-extend the byte
      i += 1
    }
    s
  }
}

object ResidualCoder {
  def validate(centroids: Seq[Seq[Double]], dim: Int): Unit = {
    require(centroids.nonEmpty && centroids.size <= 65536,
      s"need 1..65536 centroids, got ${centroids.size}")
    require(dim >= 1 && dim <= 1024, s"dim must be in [1, 1024], got $dim")
    require(centroids.forall(_.size == dim),
      "every centroid must have exactly dim components")
  }

  def checkTypes(name: String, vec: Expression, cell: Expression): TypeCheckResult =
    (vec.dataType, cell.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name requires (array<float|double>, int cell), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  def of(centroids: Seq[Seq[Double]], dim: Int, vec: Expression): ResidualCoder =
    new ResidualCoder(centroids.map(_.toArray).toArray, dim,
      vec.dataType.asInstanceOf[ArrayType].elementType == FloatType)

  def cellOf(c: Any): Int = c match {
    case i: Int => i
    case l: Long => l.toInt
  }
}

/** Plan reference object holding the MICRO-INTEGER centroid table
  * (`Cᵢ = round(cᵢ·10⁶)` — exact for 6dp-trained centroids) once;
  * `isFloat` fixes the element accessor at plan time. The float→micro
  * boundary replicates Spark `round` on doubles: shortest-decimal
  * BigDecimal, HALF_UP. */
class ResidualCoder(
    centroidsD: Array[Array[Double]],
    dim: Int,
    isFloat: Boolean) extends Serializable {

  private val cMicro: Array[Array[Long]] =
    centroidsD.map(_.map(ResidualCoder0.micro))

  private def elem(v: ArrayData, i: Int): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** ceil(dim/32) packed words, bit (i mod 32) of word i/32 =
    * `Rᵢ > 0` (the signWord strict-positive convention on the
    * micro-integer residual). */
  def pack(v: ArrayData, cell: Int): GenericArrayData = {
    val c = cMicro(cell)
    val nWords = (dim + 31) / 32
    val words = new Array[Long](nWords)
    var i = 0
    while (i < dim) {
      if (ResidualCoder0.micro(elem(v, i)) - c(i) > 0) words(i >> 5) |= 1L << (i & 31)
      i += 1
    }
    new GenericArrayData(words)
  }

  def scale(v: ArrayData, cell: Int): Long = {
    val c = cMicro(cell)
    var s = 0L
    var i = 0
    while (i < dim) {
      s += math.abs(ResidualCoder0.micro(elem(v, i)) - c(i))
      i += 1
    }
    s / dim
  }

  def centroidDot(v: ArrayData, cell: Int): Long = {
    val c = cMicro(cell)
    var s = 0L
    var i = 0
    while (i < dim) {
      s += ResidualCoder0.micro(elem(v, i)) * c(i)
      i += 1
    }
    s
  }

  /** `s = max|Rᵢ|` — the int8 per-vector scale. */
  def scaleInt8(v: ArrayData, cell: Int): Long = {
    val c = cMicro(cell)
    var m = 0L
    var i = 0
    while (i < dim) {
      val a = math.abs(ResidualCoder0.micro(elem(v, i)) - c(i))
      if (a > m) m = a
      i += 1
    }
    m
  }

  /** `codeᵢ = round(Rᵢ·127/s)` signed bytes packed 8 per long
    * (s = 0 → all-zero codes; the division is an IEEE double op,
    * exactly rounded, so the SQL replay is bit-identical). */
  def packInt8(v: ArrayData, cell: Int): GenericArrayData = {
    val c = cMicro(cell)
    val s = scaleInt8(v, cell)
    val nWords = (dim + 7) / 8
    val words = new Array[Long](nWords)
    if (s > 0) {
      var i = 0
      while (i < dim) {
        val r = ResidualCoder0.micro(elem(v, i)) - c(i)
        val code = java.math.BigDecimal.valueOf(r * 127.0 / s)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
        words(i >> 3) |= (code & 0xffL) << ((i & 7) << 3)
        i += 1
      }
    }
    new GenericArrayData(words)
  }
}

object ResidualCoder0 {
  /** Spark `round(x·1e6)` on a double, bit-for-bit: shortest-decimal
    * BigDecimal of the product, HALF_UP to 0 dp. */
  def micro(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
}
