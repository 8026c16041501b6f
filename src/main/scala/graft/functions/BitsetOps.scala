package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Fixed-domain bitset kernels for the bounded-node graph queries
  * (round 13 optimization).
  *
  * The part co-order projection pins its node domain to
  * `l_partkey % 16381`, so a node's whole neighborhood packs into
  * 2,048 bytes (⌈16381/64⌉ = 256 longs) REGARDLESS of corpus scale —
  * the full 16,381-row adjacency table is ≤ ~34 MB broadcast at any
  * SF, while the wedge set it replaces grows as O(E^1.5) (46M rows at
  * sf0.1, ~3G at the ×10 clone). Triangle machinery then becomes: per
  * oriented edge (u,v), AND the two out-neighbor bitsets and popcount
  * — Σ|N⁺(u)∩N⁺(v)| over edges counts every triangle exactly once
  * (the orientation is acyclic, so each triangle has one unique
  * source edge), with NO wedge rows materialized or shuffled.
  *
  * [[BitsetIntersectCount]] participates in whole-stage codegen (it is
  * the per-EDGE hot path); [[ToBitset]] and
  * [[BitsetIntersectPositions]] run per node / per edge with tight
  * eval loops (the positions array is an output allocation either
  * way).
  */
object BitsetOps {

  /** Pack an array<long> of values ∈ [0, bits) into a bitset
    * (array<long> of ⌈bits/64⌉ words). Duplicates are idempotent.
    */
  def toBitset(values: Column, bits: Int): Column =
    GraftBridge.column(ToBitset(GraftBridge.expression(values), bits))

  /** popcount(a AND b) — the |N(u) ∩ N(v)| kernel. */
  def intersectCount(a: Column, b: Column): Column =
    GraftBridge.column(
      BitsetIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Ascending member positions of (a AND b) as array<long>. */
  def intersectPositions(a: Column, b: Column): Column =
    GraftBridge.column(
      BitsetIntersectPositions(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** values: array<long> ∈ [0, bits) → bitset array<long>(⌈bits/64⌉). */
case class ToBitset(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits > 0, "bits must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "to_bitset"

  override protected def nullSafeEval(input: Any): Any = {
    val vals = input.asInstanceOf[ArrayData]
    val n = vals.numElements()
    val words = new Array[Long]((bits + 63) >>> 6)
    var i = 0
    while (i < n) {
      val v = vals.getLong(i)
      require(v >= 0 && v < bits, s"to_bitset: value $v outside [0, $bits)")
      words((v >>> 6).toInt) |= (1L << (v & 63L))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildInternal(c: Expression): ToBitset = copy(child = c)
}

/** popcount of the word-wise AND of two equal-length bitsets. */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitset_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitsetIntersectCount =
    copy(left = l, right = r)
}

/** Ascending set-bit positions of the word-wise AND (array<long>). */
case class BitsetIntersectPositions(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitset_intersect_positions"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var cnt = 0
    var i = 0
    while (i < n) {
      cnt += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    val out = new Array[Long](cnt)
    var m = 0
    i = 0
    while (i < n) {
      var w = x.getLong(i) & y.getLong(i)
      val base = i.toLong << 6
      while (w != 0L) {
        out(m) = base + java.lang.Long.numberOfTrailingZeros(w)
        m += 1
        w &= w - 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitsetIntersectPositions =
    copy(left = l, right = r)
}
