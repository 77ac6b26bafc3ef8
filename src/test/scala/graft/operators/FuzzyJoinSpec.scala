package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletion neighborhood finds substitution, insertion, and exact-dup pairs — and only those") {
    val d = Files.createTempDirectory("graft_fuzzy_fixture").toString
    Seq(
      (1L, "martha"),
      (2L, "marhta"), // transposition = 2 substitutions → NOT a d=1 neighbor
      (3L, "marta"),  // deletion of 'h' from martha (d=1 to 1; also d=1 to marhta)
      (4L, "martha"), // exact duplicate of 1
      (5L, "mortha"), // substitution at position 2 (d=1 to martha/4)
      (6L, "zzzzzz")  // far from everything
    ).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val got = FuzzyJoin.neighborCounts(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // neighbors: 1↔{3,4,5}, 2↔{3}, 3↔{1,2,4}, 4↔{1,3,5}, 5↔{1,4}, 6↔∅
    assert(got === Map(
      1L -> ((3L, 3L)), 2L -> ((1L, 3L)), 3L -> ((3L, 1L)),
      4L -> ((3L, 1L)), 5L -> ((2L, 1L))))

    // graph: edges {13,14,15,23,34,45}; wedges (1,3,4),(1,4,5),(2,3,4),
    // (3,4,5); only the first two close ((1,4),(1,5) exist; (2,4),(3,5) don't)
    val census = FuzzyJoin.triangleCensus(spark, d).collect().head
    assert((census.getLong(0), census.getLong(1), census.getLong(2)) === ((6L, 4L, 2L)))
  }
}
