package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.unsafe.types.UTF8String

/** Codegen text-sketch expressions for the dedup hot path.
  *
  * The higher-order-function formulations (transform/aggregate/zip_with)
  * evaluate through interpreted lambda plumbing with per-element boxing —
  * measured 5-20× slower than these whole-stage-codegen loops on the
  * documents corpus. Hash identity: token hash = XXH64(utf8 bytes, seed 42);
  * shingle hash = XXH64.hashLong-chain over the window's token hashes;
  * minhash_s(shingle) = XXH64.hashLong(shingleHash, s). Only hash
  * *consistency* matters to the operators (Jaccard/banding/hamming are
  * set/bit statistics), not the specific values.
  */
object TextSketch {
  val TokenSeed = 42L

  def tokenHash(t: UTF8String): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, TokenSeed)

  def tokenHashes(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) 0L else tokenHash(arr.getUTF8String(i))
      i += 1
    }
    out
  }

  def shingleHashes(th: Array[Long], n: Int): Array[Long] = {
    val windows = th.length - n + 1
    if (windows <= 0) return Array.emptyLongArray
    val out = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      var acc = TokenSeed
      var j = 0
      while (j < n) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  def distinct(xs: Array[Long]): Array[Long] = {
    if (xs.length <= 1) return xs
    val sorted = xs.clone()
    java.util.Arrays.sort(sorted)
    var n = 1
    var i = 1
    while (i < sorted.length) {
      if (sorted(i) != sorted(i - 1)) { sorted(n) = sorted(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(sorted, n)
  }
}

/** distinct_shingle_hashes(tokens, n): 64-bit hash per distinct n-token
  * window (sorted ascending). Empty array when there are fewer than n
  * tokens. */
case class DistinctShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val th = TextSketch.tokenHashes(input.asInstanceOf[ArrayData])
    new GenericArrayData(TextSketch.distinct(TextSketch.shingleHashes(th, n)))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val th = ctx.freshName("th")
      val sh = ctx.freshName("sh")
      s"""
         |long[] $th = graft.functions.TextSketch.tokenHashes($c);
         |long[] $sh = graft.functions.TextSketch.distinct(
         |    graft.functions.TextSketch.shingleHashes($th, $n));
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sh);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_signature(tokens, n, k): k-element minhash over the row's
  * n-token shingles — min over shingles of XXH64.hashLong(shingle, seed s)
  * for s in [0, k). All-MaxValue sentinel when there are no shingles. */
case class MinHashSignature(child: Expression, n: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val th = TextSketch.tokenHashes(input.asInstanceOf[ArrayData])
    val sh = TextSketch.shingleHashes(th, n)
    new GenericArrayData(MinHashSignature.sig(sh, k))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sh = ctx.freshName("sh")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sh = graft.functions.TextSketch.shingleHashes(
         |    graft.functions.TextSketch.tokenHashes($c), $n);
         |long[] $sig = graft.functions.MinHashSignature.sig($sh, $k);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def sig(shingles: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      var s = 0
      while (s < k) {
        val h = XXH64.hashLong(shingles(i), s)
        if (h < out(s)) out(s) = h
        s += 1
      }
      i += 1
    }
    out
  }
}

/** simhash64(tokens): sign-aggregated 64-bit token-hash sketch — bit i of
  * the result is 1 when more token hashes have bit i set than clear. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(TextSketch.tokenHashes(input.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.hash(graft.functions.TextSketch.tokenHashes($c));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def hash(th: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** winnowing_fingerprints(tokens, n, w): the document-fingerprint set of
  * Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting" (SIGMOD 2003): hash every n-token shingle (the rolling
  * k-gram stream), slide a window of w consecutive hashes, keep the
  * RIGHTMOST minimum per window, emit the distinct kept hashes sorted.
  * Guarantee: every w consecutive shingles contribute ≥1 fingerprint, so
  * any match of length ≥ n+w-1 tokens between two documents shares ≥1
  * fingerprint. Sliding-window minimum via monotonic deque — O(m) per row,
  * one codegen call. */
case class WinnowingFingerprints(child: Expression, n: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val th = TextSketch.tokenHashes(input.asInstanceOf[ArrayData])
    new GenericArrayData(WinnowingFingerprints.winnow(TextSketch.shingleHashes(th, n), w))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val fp = ctx.freshName("fp")
      s"""
         |long[] $fp = graft.functions.WinnowingFingerprints.winnow(
         |    graft.functions.TextSketch.shingleHashes(
         |        graft.functions.TextSketch.tokenHashes($c), $n), $w);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($fp);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingFingerprints {
  /** Rightmost-min-per-window over the shingle-hash stream, distinct +
    * sorted. Windows shorter than w (short docs) collapse to one window so
    * a shingled doc always yields ≥1 fingerprint. */
  def winnow(sh: Array[Long], w: Int): Array[Long] = {
    if (sh.length == 0) return Array.emptyLongArray
    if (sh.length <= w) {
      var min = sh(0); var i = 1
      while (i < sh.length) { if (sh(i) <= min) min = sh(i); i += 1 }
      return Array(min)
    }
    val kept = new Array[Long](sh.length - w + 1)
    var nKept = 0
    // monotonic deque of indices; head = index of current window minimum.
    // Ties keep the RIGHTMOST index (<= pop), per robust winnowing.
    val deque = new Array[Int](sh.length)
    var head = 0; var tail = 0 // [head, tail)
    var i = 0
    while (i < sh.length) {
      while (tail > head && sh(deque(tail - 1)) >= sh(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) { kept(nKept) = sh(deque(head)); nKept += 1 }
      i += 1
    }
    TextSketch.distinct(java.util.Arrays.copyOf(kept, nKept))
  }
}

object TextExpressions {
  def distinctShingleHashes(tokens: Column, n: Int): Column =
    CatalystBridge.column(DistinctShingleHashes(CatalystBridge.expression(tokens), n))
  def minhashSignature(tokens: Column, n: Int, k: Int): Column =
    CatalystBridge.column(MinHashSignature(CatalystBridge.expression(tokens), n, k))
  def simhash64(tokens: Column): Column =
    CatalystBridge.column(SimHash64(CatalystBridge.expression(tokens)))
  def winnowingFingerprints(tokens: Column, n: Int, w: Int): Column =
    CatalystBridge.column(WinnowingFingerprints(CatalystBridge.expression(tokens), n, w))
}
