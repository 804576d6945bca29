package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd native
  * expression — the canonicalization step a text-dedup pipeline needs
  * BEFORE hashing/shingling, since visually-identical strings with
  * different codepoint sequences ("é" composed vs "e"+U+0301) otherwise
  * fingerprint apart. Spark ships no normalization builtin; a Scala UDF
  * would break whole-stage codegen in exactly the map-heavy scan stage
  * where this runs.
  *
  * Fast path: `Normalizer.isNormalized` on the already-normalized case
  * (the overwhelming majority of real corpora) costs one scan and no
  * allocation — only denormalized strings pay for the rewrite.
  *
  * Reference behavior baseline: `java.text.Normalizer` implements the
  * Unicode standard forms, and DuckDB's `nfc_normalize` (the oracle
  * twin) implements the same UAX #15 NFC — byte-identical outputs.
  */
object UnicodeNormalizeImpl {
  private val Forms = Array(Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def formOrdinal(name: String): Int = name.toUpperCase match {
    case "NFC" => 0
    case "NFD" => 1
    case "NFKC" => 2
    case "NFKD" => 3
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (NFC|NFD|NFKC|NFKD)")
  }

  def normalize(s: UTF8String, formOrdinal: Int): UTF8String = {
    val form = Forms(formOrdinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

case class UnicodeNormalize(child: Expression, formOrdinal: Int)
    extends UnaryExpression {
  require(formOrdinal >= 0 && formOrdinal <= 3)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    UnicodeNormalizeImpl.normalize(s.asInstanceOf[UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.UnicodeNormalizeImpl.normalize($s, $formOrdinal)")

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
}

object UnicodeNormalizeCol {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `unicode_normalize(col, "NFC")` → normalized string column. */
  def unicode_normalize(col: Column, form: String = "NFC"): Column =
    column(UnicodeNormalize(expression(col),
      UnicodeNormalizeImpl.formOrdinal(form)))
}
