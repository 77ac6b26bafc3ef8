package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** The NFC kernel against the JDK reference and through the SQL registry. */
class NfcNormalizeSpec extends SparkSpec {

  private def nfc(s: String): String =
    NfcNormalize.nfc(UTF8String.fromString(s)).toString

  test("composes decomposed sequences; leaves excluded/absent compositions decomposed") {
    assert(nfc("é") == "é") // e + combining acute -> é
    assert(nfc("ñ") == "ñ") // n + combining tilde -> ñ
    assert(nfc("ś") == "ś") // s + acute -> ś
    // b has no precomposed acute form: the sequence stays decomposed
    assert(nfc("b́") == "b́")
    // already-composed text is untouched
    assert(nfc("éñ") == "éñ")
    // mixed: per-letter composition inside a longer string
    assert(nfc("zébra ñu") == "zébra ñu")
  }

  test("ASCII fast path returns the SAME UTF8String instance (identity, no transcode)") {
    val in = UTF8String.fromString("plain ascii text 123")
    assert(NfcNormalize.nfc(in) eq in)
  }

  test("registered as nfc_normalize in SQL; null passes through") {
    val got = spark.sql(
      "SELECT nfc_normalize('e\u0301'), nfc_normalize(CAST(NULL AS STRING))").collect().head
    assert(got.getString(0) == "\u00e9" && got.isNullAt(1))
  }
}
