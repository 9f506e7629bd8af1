package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/** Native Catalyst expressions for the vector/sketch hot paths.
  *
  * Spark's higher-order array functions (`transform`/`aggregate`/`zip_with`)
  * are evaluated INTERPRETED, boxing every element and re-evaluating nested
  * function calls per lambda application — a 64-element dot product costs
  * ~10µs instead of ~50ns. These expressions do the same math with primitive
  * loops over `ArrayData`, preserving bit-identical results (same left-to-
  * right float64 accumulation order), and cut the sketch/similarity queries
  * by 10-100×. They are per-row scalar calls (CodegenFallback is one boxed
  * call per row, not per element), so whole-stage codegen around them stays
  * intact.
  */
object VectorExpressions {

  /** Float64 dot product of two float arrays, accumulated in array order —
    * bit-identical to aggregate(zip_with(a, b, _*_), 0d, _+_). Generates a
    * primitive loop under whole-stage codegen (same arithmetic order as the
    * interpreted path). */
  case class ArrayDotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |${ev.value} = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value} += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Float64 L2 norm of a float array (in-order accumulation + sqrt);
    * codegen'd primitive loop. */
  case class ArrayL2Norm(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val v = ctx.freshName("v")
        s"""
           |${ev.value} = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = (double) $a.getFloat($i);
           |  ${ev.value} += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt(${ev.value});
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** MinHash signature from an int-hash array: for each of k fixed-seed
    * universal hashes h_i(x) = (a_i*x + b_i) mod (2^31-1), the minimum over
    * the input hashes. One pass over the array computes all k minima. */
  case class MinHashSignature(child: Expression, k: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val P = 2147483647L
    // a ∈ [1, P), b ∈ [0, P): with the input also reduced mod P before the
    // multiply, a*x + b < 2^62 — no Long overflow (the earlier a < 2^32
    // variant overflowed for large x, silently biasing the "universal" hash).
    private lazy val (as, bs) = {
      val rnd = new scala.util.Random(seed)
      val a = Array.fill(k)(rnd.nextInt((P - 1).toInt).toLong + 1L)
      val b = Array.fill(k)(rnd.nextInt(P.toInt).toLong)
      (a, b)
    }
    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < hs.numElements()) {
        val x = java.lang.Math.floorMod(hs.getInt(i).toLong, P)
        var j = 0
        while (j < k) {
          val v = (as(j) * x + bs(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      ArrayData.toArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** 64-bit SimHash from a long-hash array: per-bit ±1 votes, sign bits
    * packed into one long. Replaces the 64-aggregate interpreted form. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < hs.numElements()) {
        val h = hs.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (votes(j) > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  def arrayDot(a: Column, b: Column): Column =
    column(ArrayDotProduct(expression(a), expression(b)))
  def arrayL2Norm(a: Column): Column = column(ArrayL2Norm(expression(a)))
  def minhashSig(intHashes: Column, k: Int, seed: Long): Column =
    column(MinHashSignature(expression(intHashes), k, seed))
  def simhash64(longHashes: Column): Column =
    column(SimHash64(expression(longHashes)))
}
