package graft

/** Driver-contract smoke: entry() returns rows at sf0.001; every queries
  * key with an oracle also exists in queries (name alignment).
  */
class EntrySpec extends SparkTestBase {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
