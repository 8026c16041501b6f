package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{GraftBridge, GraftExpectsTypes}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit rolling polynomial document fingerprint.
  *
  * h = Σ h*31 + byte over the UTF-8 bytes (Long wraparound) — the
  * classic multiplicative rolling hash. A native Catalyst
  * `Expression` with `doGenCode` so the loop is inlined into
  * whole-stage codegen: zero boxing, zero UDF serialization — the
  * preferred shape for a per-row function on a 100 TB scan.
  *
  * Capability parallel: the reference keys state by identity fields;
  * a content fingerprint is the batch-pipeline analog for exact-dup
  * detection at scale (hash-groupBy instead of string-groupBy keeps
  * shuffle rows narrow).
  */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with GraftExpectsTypes {

  // Declared input type keeps the interpreted eval (UTF8String cast)
  // and codegen (getBytes) consistent: non-string inputs are cast or
  // rejected at analysis instead of failing differently per path.
  override def expectedTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** fmix64 avalanche (the MurmurHash3 finalizer) as a column
  * expression — the SAME mix BottomKSample orders its buffer by, so
  * sketch post-processing (KMV set-operation estimates, merged
  * bottom-k re-ranking) can re-derive a sample element's rank
  * without leaving the plan. Codegen; bijective, so distinct inputs
  * keep distinct ranks.
  */
case class Fmix64(child: Expression)
    extends UnaryExpression with GraftExpectsTypes {

  // LONG-only by declaration: without this, an INT input would throw
  // ClassCastException on the interpreted path while codegen silently
  // widened — divergent behavior for the same plan. ImplicitCastInput-
  // Types inserts the widening cast (or rejects) at analysis time, so
  // both paths see a real Long.
  override def expectedTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fmix64"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(VectorExpressions.fmix64(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val x = ctx.freshName("x")
      s"""
         |long $x = $c;
         |$x ^= $x >>> 33; $x *= 0xff51afd7ed558ccdL;
         |$x ^= $x >>> 33; $x *= 0xc4ceb9fe1a85ec53L;
         |$x ^= $x >>> 33;
         |${ev.value} = $x;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fmix64 =
    copy(child = newChild)
}

object Fingerprint64 {
  /** Column-API entry point. */
  def fingerprint64(c: Column): Column =
    GraftBridge.column(Fingerprint64(GraftBridge.expression(c)))

  /** fmix64 of a long column (BottomKSample's rank order). */
  def fmix64(c: Column): Column =
    GraftBridge.column(Fmix64(GraftBridge.expression(c)))

  /** Register `fingerprint64`/`fmix64` for spark.sql use — delegates
    * to the central GraftFunctions builders so the arity validation
    * is identical on every registration path.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.injections
      .filter { case (id, _, _) =>
        id.funcName == "fingerprint64" || id.funcName == "fmix64" }
      .foreach { case (id, _, builder) =>
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(id.funcName, builder, "built-in") }
}
