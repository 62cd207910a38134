package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe whose bits live in a Spark BROADCAST
  * VARIABLE instead of the expression tree (VERDICT r6 #2: a `lit(bytes)`
  * filter rides the logical plan — driver memory, plan serialization,
  * task-binary broadcast and plan stringification all carry it, which
  * falls over at the operator's own motivating scale of ~1.2 GB of bits
  * for 10⁹ benchmark keys). Here the plan carries only the broadcast
  * HANDLE (a few dozen bytes); executors fetch the bits once via the
  * block manager and deserialize the filter once per codegen'd operator
  * instance, so the per-row probe stays a row-local bit test inside
  * WholeStageCodegen, exactly like Spark's own BloomFilterMightContain.
  *
  * The child must be LONG (xxhash64 of the fingerprint — see
  * [[graft.functions.Dedup.decontaminateExactBloom]]).
  */
case class BloomMightContainBroadcast(
    bits: Broadcast[Array[Byte]],
    child: Expression)
  extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom broadcast probe needs a LONG key, got ${child.dataType}")

  // deserialized once per task attempt on the interpreted path; the
  // broadcast handle is what the case class (and thus the serialized
  // plan) actually carries
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits.value))

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", bits, bcCls)
    val fCls = classOf[BloomFilter].getName
    // once per generated-class instance, not per row; readFrom declares
    // IOException so the init must wrap it for janino
    val fVar = ctx.addMutableState(fCls, "graftBloomFilter",
      v => s"""try {
         |  $v = $fCls.readFrom(
         |    new java.io.ByteArrayInputStream((byte[]) $bcRef.value()));
         |} catch (java.io.IOException e) { throw new RuntimeException(e); }
         |""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $fVar.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
