package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector / sketch hot paths.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * are interpreted per element — measured ~100× slower than a fused
  * loop on the embedding workloads (a 64-dim cosine over 125k pairs
  * took minutes). These expressions run the loops in Java:
  * `ArrayDot` participates in whole-stage codegen (it's per-PAIR on
  * O(n²)/O(n·k) joins); the per-ROW sketch builders use eval with a
  * tight loop, which is already off the hot pair path.
  */
object VectorExpressions {

  /** splitmix/murmur-style 64-bit finalizer. */
  @inline private[graft] def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  def arrayDot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def charShingleHashes(text: Column, k: Int): Column =
    GraftBridge.column(CharShingleHashes(GraftBridge.expression(text), k))

  def positionedNgramHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(PositionedNgramHashes(GraftBridge.expression(tokens), n))

  def tokenNgramHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(TokenNgramHashes(GraftBridge.expression(tokens), n))

  def minHashSigs(hashes: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSigs(GraftBridge.expression(hashes), numHashes))

  def simHash64(tokenHashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokenHashes)))

  def tokenSetStats(tokens: Column, sets: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenSetStats(GraftBridge.expression(tokens), sets))

  def tokenPairs(tokens: Column): Column =
    GraftBridge.column(TokenPairs(GraftBridge.expression(tokens)))

  /** Winnowing selection (Schleimer et al. 2003) over a token array:
    * k-gram rolling hashes, w-window minima, deduped. See
    * [[WinnowFingerprints]].
    */
  def winnowFingerprints(tokens: Column, k: Int = 3, w: Int = 4): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(tokens), k, w))

  def tokenRepetitionStats(tokens: Column): Column =
    GraftBridge.column(TokenRepetitionStats(GraftBridge.expression(tokens)))

  def tokenEntropyStats(tokens: Column): Column =
    GraftBridge.column(TokenEntropyStats(GraftBridge.expression(tokens)))
}

/** Sequential-fold dot product of two array<double> columns (null
  * elements not supported). Fold order matches a left-to-right SQL
  * `list_dot_product`, so external oracles agree bit-for-bit.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

/** Distinct hashes of every k-char window of a string, sorted.
  * Byte-windowed (≡ char-windowed for ASCII corpora); one fused pass
  * replaces `array_distinct(transform(sequence(...), substr(...)))`
  * and keeps shuffle payloads at 8 bytes/shingle.
  */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    val seen = new java.util.HashSet[java.lang.Long](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      var x = 0L
      var j = 0
      while (j < k) { x = (x << 8) | (bytes(i + j) & 0xffL); j += 1 }
      seen.add(VectorExpressions.fmix64(x))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): CharShingleHashes = copy(child = c)
}

/** Distinct hashes of every n-token window of a token array, sorted.
  * The word-shingle analog of CharShingleHashes: token n-grams are
  * the standard text-dedup shingle (char n-grams saturate when the
  * corpus shares a small vocabulary — unrelated docs then collide in
  * every LSH band). Hashing: per-token 31-polynomial over UTF-8
  * bytes, n-gram combined by a 31-chain, fmix64 finalizer.
  */
case class TokenNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val tokHashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      val bytes = toks.getUTF8String(i).getBytes
      var h = 0L
      var j = 0
      while (j < bytes.length) { h = h * 31L + bytes(j); j += 1 }
      // separator step so ["ab","c"] != ["a","bc"] within a window
      tokHashes(i) = h * 31L + ' '.toLong
      i += 1
    }
    val windows = m - n + 1
    val seen = new java.util.HashSet[java.lang.Long](math.max(16, windows * 2))
    i = 0
    while (i < windows) {
      var x = 0L
      var j = 0
      while (j < n) { x = x * 31L + tokHashes(i + j); j += 1 }
      seen.add(VectorExpressions.fmix64(x))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): TokenNgramHashes = copy(child = c)
}

/** POSITIONED variant of [[TokenNgramHashes]]: hash of the n-gram
  * STARTING AT EACH POSITION (no dedupe, no sort — index i of the
  * output is the window at token position i). Same hash family
  * (31-poly token hashes with a separator step, 31-combined over the
  * window, fmix64-finished), so positioned hashes join against
  * [[TokenNgramHashes]] output — the dup-span interval query
  * (span_dup_intervals) decides duplication on the distinct relation
  * and locates positions with this one, without ever re-building the
  * n-gram STRINGS per position. Empty array for fewer than n tokens.
  */
case class PositionedNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positioned_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val tokHashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      val bytes = toks.getUTF8String(i).getBytes
      var h = 0L
      var j = 0
      while (j < bytes.length) { h = h * 31L + bytes(j); j += 1 }
      tokHashes(i) = h * 31L + ' '.toLong
      i += 1
    }
    val windows = math.max(m - n + 1, 0)
    val out = new Array[Long](windows)
    i = 0
    while (i < windows) {
      var x = 0L
      var j = 0
      while (j < n) { x = x * 31L + tokHashes(i + j); j += 1 }
      out(i) = VectorExpressions.fmix64(x)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PositionedNgramHashes = copy(child = c)
}

/** All `numHashes` minhash signatures in ONE pass over the element
  * hashes: sig_i = min over h of fmix64(h ⊕ GOLDEN·(i+1)).
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sigs = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var p = 0
      while (p < numHashes) {
        val v = VectorExpressions.fmix64(h ^ (0x9e3779b97f4a7c15L * (p + 1)))
        if (v < sigs(p)) sigs(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigs = copy(child = c)
}

/** 64-bit SimHash over an array of TOKENS (strings): each token is
  * hashed internally (31-polynomial + fmix64 — fused, no interpreted
  * per-token lambda), then bit j of the signature is set iff
  * Σ_tokens (bit j of hash ? +1 : −1) > 0.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val bytes = toks.getUTF8String(i).getBytes
      // Empty tokens (leading/trailing separator artifacts) carry no
      // signal and differ between tokenizers — skip for oracle parity.
      if (bytes.length > 0) {
        var t = 0L
        var b = 0
        while (b < bytes.length) { t = t * 31L + bytes(b); b += 1 }
        val h = VectorExpressions.fmix64(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Adjacent token pairs: array<struct<w1, w2>> of the n−1 bigrams of
  * a token array (empty for n < 2). One fused pass replacing the
  * interpreted `transform(sequence(...), i -> struct(t[i], t[i+1]))`
  * HOF spelling on the bigram corpus paths (text_top_bigrams,
  * text_lm_score) — tokens are referenced, not re-hashed, so the
  * downstream groupBy sees the exact strings.
  */
case class TokenPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = true),
      StructField("w2", StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "token_pairs"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = toks.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = toks.getUTF8String(i)
      out(i - 1) = InternalRow(prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): TokenPairs = copy(child = c)
}

/** One-pass winnowing fingerprint selection (Schleimer, Wilkerson &
  * Aiken 2003): hash every k-gram of the token array with the
  * [[Fingerprint64]] rolling hash (h(a||b) = h(a)·31^|b| + h(b), so
  * each token's hash and 31-power are computed ONCE and grams combine
  * in O(1) — no gram strings are ever built), then select each
  * w-window's minimum (ties → leftmost) and dedup. Output:
  * array<struct<pos, h>> of the selected fingerprints. Replaces the
  * interpreted transform/slice/array_min HOF spelling, which built
  * every gram string and re-hashed every byte w times (measured
  * 3.8 s → sub-second on the sf0.1 corpus).
  *
  * Selections of a given position form a CONTIGUOUS window run (a
  * smaller hash C entering after position A's reign must sit right of
  * A, and A re-winning would need A ≥ window start > C > A — a
  * contradiction), so adjacent dedup ≡ global per-doc distinct.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "k and w must be positive")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    val tp = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bytes = toks.getUTF8String(i).getBytes
      var h = 0L
      var p = 1L
      var j = 0
      while (j < bytes.length) { h = h * 31L + bytes(j); p *= 31L; j += 1 }
      th(i) = h
      tp(i) = p
      i += 1
    }
    val ng = n - k + 1
    val gh = new Array[Long](ng)
    i = 0
    while (i < ng) {
      var h = th(i)
      var j = 1
      while (j < k) {
        // append the ' ' separator byte (32), then token i+j
        h = (h * 31L + 32L) * tp(i + j) + th(i + j)
        j += 1
      }
      gh(i) = h
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    val nW = math.max(ng - w, 0) + 1
    var j = 0
    while (j < nW) {
      val end = math.min(j + w, ng)
      var mi = j
      var x = j + 1
      while (x < end) { if (gh(x) < gh(mi)) mi = x; x += 1 }
      if (mi != lastPos) { out += InternalRow(mi.toLong, gh(mi)); lastPos = mi }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** One-pass repetition statistics over a token array — the
  * Gopher-style repetition quality signals (repetitive boilerplate
  * and spam have low type-token ratio and a dominant token/bigram).
  * Output: struct<n_toks, n_distinct, top_tok, n_bigrams,
  * top_bigram> (all bigint); the ratios (type-token ratio, top-token
  * fraction, top-bigram fraction) divide out in plain SQL. Exact
  * counts (hash maps on the token strings, not hashes), one pass, no
  * explode — the per-doc shape; for CORPUS-level n-gram stats see
  * text_top_bigrams, which must shuffle by construction.
  */
case class TokenRepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_tok", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false)))
  override def prettyName: String = "token_repetition_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val tokCounts = new java.util.HashMap[UTF8String, Array[Int]](math.max(16, n * 2))
    val bigramCounts = new java.util.HashMap[String, Array[Int]](math.max(16, n * 2))
    var topTok = 0
    var topBigram = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      var c = tokCounts.get(t)
      if (c == null) { c = Array(0); tokCounts.put(t.clone(), c) }
      c(0) += 1
      if (c(0) > topTok) topTok = c(0)
      if (prev != null) {
        val bg = prev.toString + " " + t.toString
        var bc = bigramCounts.get(bg)
        if (bc == null) { bc = Array(0); bigramCounts.put(bg, bc) }
        bc(0) += 1
        if (bc(0) > topBigram) topBigram = bc(0)
      }
      prev = t
      i += 1
    }
    InternalRow(n.toLong, tokCounts.size.toLong, topTok.toLong,
      math.max(n - 1, 0).toLong, topBigram.toLong)
  }

  override protected def withNewChildInternal(c: Expression): TokenRepetitionStats =
    copy(child = c)
}

/** One-pass Shannon-entropy statistics over a token array: total
  * tokens, distinct types, and S = Σ c·ln(c) over per-type counts —
  * entropy is then ln(n) − S/n. S is accumulated over DISTINCT COUNT
  * VALUES in ascending order (m_c types share count c contribute
  * m_c·(c·ln c) each), a canonical order independent of hash-map
  * iteration — so the double is REPRODUCIBLE across runs, partitions,
  * and engines: an external oracle folding the same terms in the same
  * order (e.g. list_reduce over list(... ORDER BY c)) agrees
  * bit-for-bit. One fused pass, no explode, no shuffle.
  */
case class TokenEntropyStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_clnc", DoubleType, nullable = false)))
  override def prettyName: String = "token_entropy_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val tokCounts = new java.util.HashMap[UTF8String, Array[Int]](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      var c = tokCounts.get(t)
      if (c == null) { c = Array(0); tokCounts.put(t.clone(), c) }
      c(0) += 1
      i += 1
    }
    // histogram of counts: count value c -> number of types m_c
    val byCount = new java.util.TreeMap[Int, Int]()
    val it = tokCounts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      // getOrDefault: TreeMap[Int, Int].get unboxes an absent key's
      // null to 0 silently — spell the default instead of relying on it
      byCount.put(c, byCount.getOrDefault(c, 0) + 1)
    }
    var s = 0.0
    val ct = byCount.entrySet().iterator()
    while (ct.hasNext) {
      val e = ct.next()
      val c = e.getKey.intValue()
      s += e.getValue.intValue() * (c * Math.log(c))
    }
    InternalRow(n.toLong, tokCounts.size.toLong, s)
  }

  override protected def withNewChildInternal(c: Expression): TokenEntropyStats =
    copy(child = c)
}

/** One-pass token statistics: total token length plus membership hits
  * for up to `sets.size` stopword sets. Replaces one interpreted
  * higher-order filter per set with a single fused scan.
  * Output: struct<sum_len: bigint, hits0..hitsN-1: int>.
  */
case class TokenSetStats(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val lookups: Array[java.util.HashSet[UTF8String]] =
    sets.map { ws =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def dataType: DataType = StructType(
    StructField("sum_len", LongType, nullable = false) +:
      sets.indices.map(i => StructField(s"hits$i", IntegerType, nullable = false)))
  override def prettyName: String = "token_set_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var sumLen = 0L
    val hits = new Array[Int](lookups.length)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      sumLen += t.numChars()
      var s = 0
      while (s < lookups.length) {
        if (lookups(s).contains(t)) hits(s) += 1
        s += 1
      }
      i += 1
    }
    val row = new Array[Any](1 + hits.length)
    row(0) = sumLen
    var s = 0
    while (s < hits.length) { row(s + 1) = hits(s); s += 1 }
    InternalRow.fromSeq(row.toIndexedSeq)
  }

  override protected def withNewChildInternal(c: Expression): TokenSetStats = copy(child = c)
}
