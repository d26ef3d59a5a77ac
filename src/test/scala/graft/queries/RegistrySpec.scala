package graft.queries

import graft.SparkSpec

/** Smoke every registered query at sf0.001 (runs, returns rows, unique
  * columns) plus contract hygiene on the driver surface: the registry is
  * the single source of truth for SparkEntry.queries/oracleSql, so name
  * collisions or dangling oracle keys would silently drop queries from
  * the correctness gate. The exact value check is the driver's DuckDB
  * gate (tools/compare_oracle.py locally).
  */
class RegistrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val missing = Registry.oracleSql.keySet -- Registry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names are unique — a collision would shadow a query in the Map") {
    val names = Registry.all.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
  }

  test("the surface is the declared size (SURVEY §2.1 stays in lockstep)") {
    assert(Registry.all.size == 270, s"registered=${Registry.all.size}")
    assert(Registry.oracleSql.size == 267, s"oracle-checked=${Registry.oracleSql.size}")
  }

  test("every query belongs to exactly one family") {
    val fam = Registry.familyOf
    Registry.all.foreach(q => assert(fam.contains(q.name), s"${q.name} has no family"))
    assert(Registry.byFamily.map(_._2.size).sum == Registry.all.size)
  }

  test("README query index stays in sync (regenerate: runMain graft.QueryIndexGen)") {
    val readme = java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))
    val begin = readme.indexOf("QUERY_INDEX_BEGIN")
    assert(begin >= 0, "README has no generated query index")
    val end = readme.indexOf("QUERY_INDEX_END")
    assert(end > begin)
    val committed = readme.substring(begin, end).split("\n")
      .filter(_.startsWith("| `")).toSeq
      // drop the bench-time column (legitimately changes per capture):
      // keep everything up to and including the oracle column's pipe
      .map(r => r.take(r.lastIndexOf("|", r.length - 2) + 1))
    val expected = graft.QueryIndexGen.structuralRows()
    assert(committed.size == expected.size,
      s"README lists ${committed.size} queries, registry has ${expected.size}")
    committed.zip(expected).foreach { case (c, e) =>
      assert(c == e, s"README index row drifted:\n  readme: $c\n  fresh:  $e")
    }
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
