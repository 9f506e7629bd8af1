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

  /** Full banded sign-LSH signature in ONE native pass: element b of the
    * output is band b's bucket — rowsPerBand sign bits of float64 plane
    * dots, packed little-endian. Bit-identical to the composite form
    * (`array` of per-band sums of `when(arrayDot(e, plane) >= 0, 1<<r)`):
    * same planes, same in-order float64 accumulation per dot. The
    * composite builds nBands×rowsPerBand dot-product expression nodes each
    * carrying a 64-element literal array — at gate scale its ANALYSIS and
    * CODEGEN dominate the whole LSH pipeline; this expression is one node
    * with the plane matrix held as plain JVM state. CodegenFallback costs
    * one boxed call per row (not per plane), so surrounding whole-stage
    * codegen stays intact. */
  case class BandSignature(child: Expression, planes: Array[Array[Float]],
                           rowsPerBand: Int)
      extends UnaryExpression with CodegenFallback {
    require(planes.length % rowsPerBand == 0)
    private val nBands = planes.length / rowsPerBand
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val e = input.asInstanceOf[ArrayData]
      val out = new Array[Int](nBands)
      var b = 0
      while (b < nBands) {
        var bucket = 0
        var r = 0
        while (r < rowsPerBand) {
          val p = planes(b * rowsPerBand + r)
          val n = math.min(e.numElements(), p.length)
          var acc = 0.0
          var i = 0
          while (i < n) {
            acc += e.getFloat(i).toDouble * p(i).toDouble
            i += 1
          }
          if (acc >= 0) bucket |= (1 << r)
          r += 1
        }
        out(b) = bucket
        b += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** MinHash signature from a long-hash array: for each of k fixed-seed
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
        val x = java.lang.Math.floorMod(hs.getLong(i), P)
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

  /** Hashed word n-gram (shingle) array in ONE native pass: for each
    * window of `n` consecutive tokens, join with single spaces and hash.
    * Replaces the interpreted `transform(sequence(...), i -> concat_ws(
    * ' ', toks[i], ...))` + per-element hash HOF chain, which costs ~1 ms
    * per document at realistic token counts (every lambda application is
    * an interpreted expression-tree walk with boxing) — the dominant cost
    * of every sketch query. Algorithms produce values byte-identical to
    * their SQL forms:
    *  - "murmur3": `hash(s)` (seed 42, int)
    *  - "xxhash64": `xxhash64(s)` (seed 42)
    *  - "md5_60": `conv(substring(md5(s), 1, 15), 16, 10)` — the first 60
    *    bits of the md5, i.e. the big-endian first 8 bytes >>> 4 (this is
    *    the hash the SimHash DuckDB oracle recomputes)
    * `distinct` keeps the first occurrence of each hash (matching
    * `array_distinct` on the shingle strings modulo hash collisions). */
  case class WordNgramHashes(child: Expression, n: Int, algo: String,
                             distinct: Boolean)
      extends UnaryExpression with CodegenFallback {
    require(Seq("murmur3", "xxhash64", "md5_60").contains(algo))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val space = UTF8String.fromString(" ")
    // MessageDigest is stateful and not thread-safe; tasks share the
    // expression instance in local mode, so the digest is per-thread.
    @transient private lazy val md5Local =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    private def hashOne(s: UTF8String): Long = algo match {
      case "murmur3" =>
        org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(s, org.apache.spark.sql.types.StringType, 42L)
      case "xxhash64" =>
        org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(s, org.apache.spark.sql.types.StringType, 42L)
      case "md5_60" =>
        val md = md5Local.get()
        md.reset()
        val d = md.digest(s.getBytes)
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
        v >>> 4
    }
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val m = toks.numElements()
      if (m < n) ArrayData.toArrayData(Array.empty[Long])
      else {
        val out = new Array[Long](m - n + 1)
        val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
        var w = 0
        var i = 0
        while (i <= m - n) {
          val s =
            if (n == 1) toks.getUTF8String(i)
            else {
              val parts = new Array[UTF8String](n)
              var j = 0
              while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
              UTF8String.concatWs(space, parts: _*)
            }
          val h = hashOne(s)
          if (seen == null || seen.add(h)) { out(w) = h; w += 1 }
          i += 1
        }
        ArrayData.toArrayData(if (w == out.length) out else out.take(w))
      }
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
  def minhashSig(longHashes: Column, k: Int, seed: Long): Column =
    column(MinHashSignature(expression(longHashes), k, seed))
  def simhash64(longHashes: Column): Column =
    column(SimHash64(expression(longHashes)))
  def wordNgramHashes(toks: Column, n: Int, algo: String,
                      distinct: Boolean): Column =
    column(WordNgramHashes(expression(toks), n, algo, distinct))
  def bandSignature(e: Column, planes: Array[Array[Float]],
                    rowsPerBand: Int): Column =
    column(BandSignature(expression(e), planes, rowsPerBand))
}
