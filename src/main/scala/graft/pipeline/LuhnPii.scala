package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Checksum-validated payment-card redaction — the PII class where a bare
  * regex is WRONG both ways: 16-digit order/tracking numbers that fail the
  * Luhn check are not PII and must survive, while anything passing it is
  * treated as a card number. Complements [[Cleaning]]'s typed
  * email/SSN/phone redaction (`text_pii_redact`) with the one PII type
  * whose definition is arithmetic, not lexical.
  *
  * Luhn (ISO/IEC 7812): from the right, double every second digit,
  * subtract 9 when the double exceeds 9, sum; valid iff sum % 10 == 0.
  * For a 16-digit number that means the ODD 1-based positions from the
  * LEFT are doubled. Entirely integer arithmetic — bit-stable across
  * engines by construction.
  *
  * Shape: candidates via one codegen'd `regexp_extract_all` (16-digit
  * runs; a longer digit run matches its first 16 in both engines'
  * left-to-right non-overlapping scan), per-candidate Luhn as a native
  * fold over the 16 positions, redaction as a fold replacing each VALID
  * candidate with `<CARD>`. Map-only, zero state — rides the scan like
  * every other screen.
  */
object LuhnPii extends QueryModule {

  /** Luhn-sum SQL fragment over a 16-char digit string column `c`
    * (shared Spark/DuckDB spelling modulo the list/array function names).
    */
  private def luhnValidSpark(c: String): String =
    s"""aggregate(sequence(1, 16), 0, (s, i) ->
          s + CASE WHEN i % 2 = 1
                THEN IF(2 * (ascii(substring($c, i, 1)) - 48) > 9,
                        2 * (ascii(substring($c, i, 1)) - 48) - 9,
                        2 * (ascii(substring($c, i, 1)) - 48))
                ELSE ascii(substring($c, i, 1)) - 48 END) % 10 = 0"""

  /** Redact Luhn-valid 16-digit runs in the named text column to `<CARD>`. */
  def redactCards(textCol: String): Column =
    expr(
      s"""aggregate(
            filter(regexp_extract_all($textCol, '\\\\d{16}', 0),
                   c -> ${luhnValidSpark("c")}),
            $textCol, (acc, c) -> replace(acc, c, '<CARD>'))""")

  /** `text_pii_luhn`: per doc, plant one VALID card (15-digit base from
    * doc_id, check digit computed by the Luhn formula) and one INVALID
    * sibling (check digit + 5 mod 10 — always fails) inside the document
    * text, then redact. Both engines construct the same planted strings
    * and run the same integer fold, so the md5 pins BOTH directions:
    * the valid card must become `<CARD>` and the invalid one must
    * survive untouched. `n_redacted` counts the valid candidates.
    */
  def luhnQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val base = "concat('4', lpad(CAST(doc_id % 100000000000000 AS STRING), 14, '0'))"
    // Luhn sum of the 15 base digits in their final positions (1..15 from
    // the left of the 16-digit result; the check digit sits at 16, undoubled)
    val baseSum =
      s"""aggregate(sequence(1, 15), 0, (s, i) ->
            s + CASE WHEN i % 2 = 1
                  THEN IF(2 * (ascii(substring($base, i, 1)) - 48) > 9,
                          2 * (ascii(substring($base, i, 1)) - 48) - 9,
                          2 * (ascii(substring($base, i, 1)) - 48))
                  ELSE ascii(substring($base, i, 1)) - 48 END)"""
    Tables.documents(spark, sfDir)
      .withColumn("check", expr(s"(10 - $baseSum % 10) % 10"))
      .withColumn("valid_card", expr(s"concat($base, CAST(check AS STRING))"))
      .withColumn("invalid_card",
        expr(s"concat($base, CAST((check + 5) % 10 AS STRING))"))
      .withColumn("planted", expr(
        "concat('Pay with ', valid_card, ' or quote order ', invalid_card, '. ', text)"))
      .withColumn("redacted", redactCards("planted"))
      .select(col("doc_id"),
        expr("md5(cast(redacted as binary))").as("digest"),
        expr("""CAST(size(filter(regexp_extract_all(planted, '\\d{16}', 0),
                 c -> """ + luhnValidSpark("c") + ")) AS BIGINT)").as("n_redacted"))
      .orderBy("doc_id")
  }

  private def luhnSqlDuck = {
    val base = "('4' || lpad(CAST(doc_id % 100000000000000 AS VARCHAR), 14, '0'))"
    def luhnSum(c: String, n: Int) =
      s"""list_aggregate(list_transform(range(1, ${n + 1}), i ->
            CASE WHEN i % 2 = 1
              THEN IF(2 * (ascii(substring($c, CAST(i AS INT), 1)) - 48) > 9,
                      2 * (ascii(substring($c, CAST(i AS INT), 1)) - 48) - 9,
                      2 * (ascii(substring($c, CAST(i AS INT), 1)) - 48))
              ELSE ascii(substring($c, CAST(i AS INT), 1)) - 48 END), 'sum')"""
    s"""WITH p AS (
          SELECT doc_id,
                 (10 - ${luhnSum(base, 15)} % 10) % 10 AS chk
          FROM documents
        ), t AS (
          SELECT d.doc_id,
                 'Pay with ' || $base || CAST(chk AS VARCHAR)
                   || ' or quote order ' || $base || CAST((chk + 5) % 10 AS VARCHAR)
                   || '. ' || d.text AS planted
          FROM documents d JOIN p USING (doc_id)
        ), r AS (
          SELECT doc_id, planted,
                 list_filter(regexp_extract_all(planted, '\\d{16}'),
                   c -> ${luhnSum("c", 16)} % 10 = 0) AS valids
          FROM t
        )
        SELECT doc_id,
               md5(list_reduce(list_prepend(planted, valids),
                   (acc, c) -> replace(acc, c, '<CARD>'))) AS digest,
               CAST(len(valids) AS BIGINT) AS n_redacted
        FROM r ORDER BY doc_id"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_luhn" -> (luhnQuery _),
  )

  override def oracle: Map[String, String] = Map(
    "text_pii_luhn" -> luhnSqlDuck,
  )
}
