package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native implementations of the hot text-hashing primitives.
  *
  * The HOF formulations in [[graft.ext.TextOps]] are semantically
  * identical (and remain the DuckDB oracle mirrors), but Spark evaluates
  * HOF lambdas interpreted with per-element closure overhead — on a
  * corpus-wide dedup pass the char-level fold dominated the runtime by
  * ~50×. These evaluate as tight JVM loops over the same arithmetic
  * (base-131 / base-31 polynomial mod 1e9+7, identical fold order), so
  * results are bit-identical to the HOF path and the oracle.
  *
  * The kernels live here as static methods so both `nullSafeEval` and
  * the generated code call the SAME JIT-compiled loop: `doGenCode`
  * emits a plain static call, which keeps the enclosing stage inside
  * whole-stage codegen (no `CodegenFallback` interpreted-projection
  * island around the hash work).
  */
object TextHashExpressions {
  final val P = 1000000007L

  def wordHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var h = 7L
      var k = 0
      while (k < s.length) {
        val cp = s.codePointAt(k)
        h = (h * 131 + cp) % P
        k += Character.charCount(cp)
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(wh: ArrayData, gram: Int): ArrayData = {
    val n = wh.numElements()
    val m = math.max(0, n - gram + 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      // left fold base 131 over the gram window — for gram=3 this is
      // bit-identical to the original ((h0*131+h1)%P*131+h2)%P
      var h = wh.getLong(i)
      var j = 1
      while (j < gram) { h = (h * 131 + wh.getLong(i + j)) % P; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def minHashSig(sh: ArrayData, numHash: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHash)(null))
    val out = new Array[Long](numHash)
    var j = 0
    while (j < numHash) {
      val a = 2L * j + 1
      val b = 7919L * j + 1
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * sh.getLong(i) + b) % P
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }

  def hyperplaneSig(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < planes) {
      var s = 0.0
      var d = 0
      while (d < n) {
        s += v.getDouble(d) * (((j * 131 + d * 31) % 23) - 11).toDouble
        d += 1
      }
      if (s >= 0) sig += (1L << j)
      j += 1
    }
    sig
  }
}

/** ARRAY<STRING> tokens → ARRAY<BIGINT> per-word polynomial hashes
  * (seed 7, base 131 over code points). */
case class WordHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_word_hashes expects ARRAY<STRING>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashExpressions.wordHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.wordHashes($c)")

  override protected def withNewChildInternal(c: Expression): WordHashes = copy(c)
  override def prettyName: String = "graft_word_hashes"
}

/** ARRAY<BIGINT> word hashes → ARRAY<BIGINT> n-gram shingle hashes
  * (default 3; gram=2 gives the bigram stream repetition scoring uses). */
case class ShingleHashes(child: Expression, gram: Int = 3)
    extends UnaryExpression {
  require(gram >= 2, s"graft_shingles: gram must be >= 2, got $gram")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashExpressions.shingleHashes(input.asInstanceOf[ArrayData], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.shingleHashes($c, $gram)")

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
  override def prettyName: String = "graft_shingles"
}

/** ARRAY<BIGINT> shingle hashes → ARRAY<BIGINT> MinHash signature with
  * `numHash` permutations h_j(x) = ((2j+1)x + 7919j + 1) mod P.
  * Empty input → all-null signature (mirrors array_min of empty). */
case class MinHashSig(child: Expression, numHash: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashExpressions.minHashSig(input.asInstanceOf[ArrayData], numHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.minHashSig($c, $numHash)")

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
  override def prettyName: String = "graft_minhash"
}

/** ARRAY<DOUBLE> vector → BIGINT hyperplane-sign signature over `planes`
  * deterministic pseudo-random hyperplanes w(j,d) = ((j*131 + d*31) % 23) - 11
  * (d 0-based). Same summation order as the HOF/oracle formulation. */
case class HyperplaneSig(child: Expression, planes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hplane_sig expects ARRAY<DOUBLE>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashExpressions.hyperplaneSig(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.hyperplaneSig($c, $planes)")

  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)
  override def prettyName: String = "graft_hplane_sig"
}
