package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(text)`: real BPE tokenization against a LEARNED merge
  * table ([[graft.functions.Bpe]]) — GPT-2-style pre-tokenization, then
  * the greedy lowest-rank merge loop within each piece. The merge ranks
  * live in a broadcast variable (the BloomMightContainBroadcast
  * pattern: the plan carries the handle, executors fetch the table once
  * via the block manager), so the per-row work is row-local and the
  * operator is a pure map stage at any scale.
  *
  * A per-operator-instance word→tokens memo exploits the Zipfian reuse
  * of words (HuggingFace tokenizers keeps the same cache); it is
  * cleared when it reaches `CacheCap` entries, bounding executor
  * memory.
  */
case class BpeEncodeBroadcast(
    ranks: Broadcast[java.util.HashMap[String, Integer]],
    child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs a STRING child, got ${child.dataType}")

  @transient private lazy val cache =
    new java.util.HashMap[String, Array[UTF8String]]()

  override def nullSafeEval(v: Any): Any =
    BpeEncodeBroadcast.encode(v.asInstanceOf[UTF8String], ranks.value, cache)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("graftBpeBc", ranks, bcCls)
    val mapCls = "java.util.HashMap"
    val rVar = ctx.addMutableState(mapCls, "graftBpeRanks",
      v => s"$v = ($mapCls) $bcRef.value();")
    val cVar = ctx.addMutableState(mapCls, "graftBpeCache",
      v => s"$v = new $mapCls();")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.BpeEncodeBroadcast.encode(
         |  $c, $rVar, $cVar);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeBroadcast {
  /** Memo bound: ~100k distinct words × small token arrays is a few MB
    * per operator instance; beyond it the memo resets (Zipf means the
    * hot head repopulates immediately).
    */
  final val CacheCap = 100000

  private val pattern =
    java.util.regex.Pattern.compile(graft.functions.TextFunctions.BpePattern)

  def encode(text: UTF8String,
             ranks: java.util.HashMap[String, Integer],
             cache: java.util.HashMap[String, Array[UTF8String]]): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    val m = pattern.matcher(s)
    while (m.find()) {
      val piece = m.group()
      var toks = cache.get(piece)
      if (toks == null) {
        toks = graft.functions.Bpe.encodeWord(piece, ranks)
          .map(UTF8String.fromString)
        if (cache.size() >= CacheCap) cache.clear()
        cache.put(piece, toks)
      }
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}
