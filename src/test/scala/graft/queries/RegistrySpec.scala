package graft.queries

import graft.SparkSpec

/** Smoke every registered query at sf0.001: runs, returns rows, and every
  * oracle key has a query. The exact value check is the driver's DuckDB
  * gate (tools/compare_oracle.py locally).
  */
class RegistrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val missing = Registry.oracleSql.keySet -- Registry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001 and returns rows") {
      val df = q.run(spark, sfDir)
      val n = df.count()
      // anti-join legitimately may be large; every query must be non-empty
      assert(n > 0, s"${q.name} returned 0 rows")
      // column names must be unique (driver sorts by name before hashing)
      val cols = df.columns.toSeq
      assert(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    }
  }

  test("entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
