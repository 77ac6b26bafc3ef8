package graft.pipeline

import graft.SparkSpec

/** Luhn redaction semantics on hand-known card numbers — the independent
  * check next to the mirrored-formula oracle row (`text_pii_luhn`):
  * 4111111111111111 is the canonical Luhn-VALID test PAN, so these
  * expectations come from outside both engines' formulas.
  */
class LuhnPiiSpec extends SparkSpec {
  import spark.implicits._

  private def redact(text: String): String =
    Seq(Tuple1(text)).toDF("t")
      .select(LuhnPii.redactCards("t").as("r"))
      .as[String].head()

  test("the canonical valid test PAN is redacted; its off-by-one sibling survives") {
    assert(redact("card 4111111111111111 ok") == "card <CARD> ok")
    assert(redact("order 4111111111111112 ok") == "order 4111111111111112 ok",
      "a Luhn-invalid 16-digit number is NOT PII and must survive")
  }

  test("multiple candidates: each validated independently") {
    val t = "a 4111111111111111 b 4111111111111112 c 5500005555555559 d"
    // 5500005555555559 is also Luhn-valid (classic MasterCard test number)
    assert(redact(t) == "a <CARD> b 4111111111111112 c <CARD> d")
  }

  test("no candidates and empty text pass through") {
    assert(redact("no digits here") == "no digits here")
    assert(redact("") == "")
    assert(redact("15 digits 411111111111111 stay") == "15 digits 411111111111111 stay")
  }

  test("a longer digit run matches its first 16 digits (documented scope)") {
    // first 16 of this 17-digit run are the valid PAN -> replaced wherever
    // that exact substring occurs, leaving the 17th digit behind
    assert(redact("41111111111111119") == "<CARD>9")
  }
}
