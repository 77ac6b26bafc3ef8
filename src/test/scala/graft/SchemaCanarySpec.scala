package graft

import org.apache.spark.sql.DataFrame

/** Testdata schema-drift canary: the loader-visible schema of every table in
  * the sf0.001 fixture must match the committed expectation EXACTLY, with a
  * per-column diff on mismatch.
  *
  * Why this exists: a driver-side testdata regeneration once changed
  * `events.ts` from nanos-long to native `timestamp[us]` and the miss
  * surfaced as 25 scattered analysis exceptions across three reports. This
  * spec turns the next silent regeneration into one failure, in seconds,
  * naming the exact table and column that moved. Update the constants here
  * (and audit the downstream loaders, e.g. [[Tables.events]]) when the
  * change is intentional.
  */
class SchemaCanarySpec extends SparkSpec {

  private def load(name: String): DataFrame = name match {
    case "events" => Tables.events(spark, Sf0001)
    case n        => Tables.table(spark, Sf0001, n)
  }

  // loader-visible catalog schemas (post-normalization where a loader
  // normalizes, e.g. events.ts → session-TZ timestamp)
  private val expected = Map(
    "region"   -> "struct<r_regionkey:int,r_name:string>",
    "nation"   -> "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer" -> ("struct<c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string>"),
    "supplier" -> "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>",
    "part"     -> ("struct<p_partkey:bigint,p_name:string,p_brand:string," +
      "p_type:string,p_size:int,p_retailprice:double>"),
    "orders"   -> ("struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string>"),
    "lineitem" -> ("struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double," +
      "l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz>"),
    "events"   -> ("struct<event_id:bigint,ts:timestamp,user_id:bigint," +
      "event_type:string,value:double,props:string>"),
    "documents" -> ("struct<doc_id:bigint,text:string,lang:string," +
      "source:string,n_chars:bigint>"),
    "embeddings" -> "struct<vec_id:bigint,embedding:array<float>,label:int>"
  )

  test("every sf0.001 table matches its committed loader-visible schema") {
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = load(name).schema.catalogString
      if (got == want) None
      else {
        // name the drifted columns, not just the blobs
        def cols(s: String): Map[String, String] =
          s.stripPrefix("struct<").stripSuffix(">")
            .split(",(?![^<]*>)").map { c =>
              val i = c.indexOf(':'); c.take(i) -> c.drop(i + 1)
            }.toMap
        val (w, g) = (cols(want), cols(got))
        val colDiff = (w.keySet ++ g.keySet).toSeq.sorted.flatMap { c =>
          (w.get(c), g.get(c)) match {
            case (a, b) if a == b => None
            case (a, b) => Some(s"    $c: expected ${a.getOrElse("<absent>")}, " +
              s"got ${b.getOrElse("<absent>")}")
          }
        }
        Some(s"  $name:\n${colDiff.mkString("\n")}\n    (full: $got)")
      }
    }
    assert(diffs.isEmpty,
      s"TESTDATA SCHEMA DRIFT — fix the loaders, then these constants:\n${diffs.mkString("\n")}")
  }
}
