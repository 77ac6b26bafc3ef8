package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Z-order (Morton) layout keys — multi-dimensional data clustering for
  * scan pruning. Sorting a table by the bit-interleave of two cell
  * coordinates places rows that are close in EITHER dimension into the
  * same files, so min/max footer statistics prune 2-D range scans that a
  * single-column sort order can only prune along its leading column. This
  * is the layout step behind `OPTIMIZE ZORDER BY`-style table maintenance,
  * expressed as a plain deterministic key column any writer can sort by.
  *
  * Reference scope: the reference writes unordered CSV output
  * (q2_ecommerce_analysis.py:271-275); physical layout for selective reads
  * is exactly the kind of 100 TB concern this engine adds.
  *
  * The interleave is a generated 2·[[Bits]]-term shift-mask sum — the same
  * expression in both dialects, all integer ops, so the oracle matches
  * exactly. Map-only: the key costs no shuffle; the SORT that applies the
  * layout is the table-maintenance job's existing global sort.
  * LayoutSpec proves the point structurally: the same box query touches
  * strictly fewer files under a z-order sort than under a leading-column
  * sort, via per-file min/max ranges — the same statistics parquet footers
  * carry.
  */
object Layout extends QueryModule {

  /** Per-dimension resolution in bits; two dimensions → 2·Bits-bit keys. */
  val Bits = 10

  /** The Morton interleave of two [[Bits]]-bit cells, Spark dialect:
    * even bit positions take x's bits, odd take y's.
    */
  def mortonSpark(x: String, y: String): String = {
    val xs = (0 until Bits).map(i => s"shiftleft((shiftright($x, $i) & 1), ${2 * i})")
    val ys = (0 until Bits).map(i => s"shiftleft((shiftright($y, $i) & 1), ${2 * i + 1})")
    (xs ++ ys).mkString("(", " + ", ")")
  }

  /** The identical interleave in DuckDB's operator syntax. */
  def mortonDuck(x: String, y: String): String = {
    val xs = (0 until Bits).map(i => s"((($x >> $i) & 1) << ${2 * i})")
    val ys = (0 until Bits).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})")
    (xs ++ ys).mkString("(", " + ", ")")
  }

  /** `orders_zorder_key`: each order's 2-D cell (customer hash cell ×
    * order-day cell) and its Morton key — the column a layout job sorts by
    * before writing.
    */
  def zorderKey(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        (col("o_custkey") % 1024).as("cust_cell"),
        (datediff(col("o_orderdate"), to_date(lit("1992-01-01")))
          .cast("bigint") % 1024).as("day_cell"))
      .withColumn("zkey", expr(mortonSpark("cust_cell", "day_cell")).cast("bigint"))
      .orderBy("o_orderkey")

  private val zorderKeySql = {
    val x = "(o_custkey % 1024)"
    val y = "(CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) % 1024)"
    s"""SELECT o_orderkey,
               o_custkey % 1024 AS cust_cell,
               CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) % 1024
                 AS day_cell,
               CAST(${mortonDuck(x, y)} AS BIGINT) AS zkey
        FROM orders ORDER BY o_orderkey"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_zorder_key" -> (zorderKey _),
  )

  override def oracle: Map[String, String] = Map(
    "orders_zorder_key" -> zorderKeySql,
  )
}
