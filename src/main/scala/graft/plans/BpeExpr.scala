package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** text → array<string> BPE tokens under a trained merge list
  * ([[graft.operators.Bpe]]) — the tokenizer's data path as one
  * native expression: lowercase whitespace words (the corpus
  * convention), each greedily encoded by merge rank, flattened in
  * order. The rank map is built once per expression instance and
  * rides the task closure; per row this allocates only the word split
  * and the symbol buffers. Same cost class and same SerDe-avoidance
  * rationale as [[LinearScoreExpr]].
  */
case class BpeEncodeExpr(child: Expression,
                         merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val words = s.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty)
        graft.operators.Bpe.encodeWord(words(i), ranks)
          .foreach(t => out += UTF8String.fromString(t))
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
