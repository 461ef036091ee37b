package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for the corpus-cleaning plane.
  *
  * Training-data pipelines normalize text to NFC before hashing or
  * deduplicating — the same glyph arrives both precomposed (é = U+00E9)
  * and decomposed (e + U+0301) from different crawls, and every dedup
  * fingerprint (exact hash, minhash shingles, winnowing) treats the two
  * byte sequences as unrelated unless the corpus is canonicalized first.
  *
  * Spark has no built-in normalizer, so this is a native Catalyst
  * `Expression` with `doGenCode` — the codegen body calls one static
  * helper (`java.text.Normalizer`, ICU-equivalent for the canonical
  * forms, pure JVM) and stays inside whole-stage codegen; the
  * fast-path `isNormalized` probe skips the allocation for the dominant
  * already-NFC case. The NFC transform is defined by the Unicode
  * standard (UAX #15), so any conforming engine — DuckDB's
  * `nfc_normalize` in the q105 oracle — produces identical bytes.
  */
object UnicodeNorm {
  /** NFC-normalize a UTF8String, returning the input object untouched
    * (no copy) when it is already normalized. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API: NFC canonical composition. */
  def nfcNormalize(c: Column): Column =
    CatalystBridge.column(NfcNormalize(CatalystBridge.expression(c)))
}

/** nfc_normalize(string): Unicode canonical composition (NFC). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNorm.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
