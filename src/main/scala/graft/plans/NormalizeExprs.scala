package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — Spark has no
  * built-in normalizer, and a Scala UDF would pay SerDe on every row
  * of a 100 TB text scan. The semantics are `java.text.Normalizer`
  * NFC (canonical decomposition + composition): "cafe" + U+0301 and
  * "café" become the SAME bytes, which is what makes exact dedup,
  * line dedup, and posting terms see through encoding differences in
  * crawled text.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (most crawl
  * text is already NFC — every ASCII doc short-circuits on the
  * Latin-1 quick-check) and lets the already-normal row return its
  * INPUT UTF8String untouched — zero allocation on the hot path; only
  * rows that actually need composing pay the String round-trip.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) v
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
