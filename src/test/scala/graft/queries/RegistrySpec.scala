package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Contract hygiene on the driver surface: the registry is the single
  * source of truth for SparkEntry.queries/oracleSql, so name collisions
  * or dangling oracle keys would silently drop queries from the
  * correctness gate. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique — a collision would shadow a query in the Map") {
    val names = Registry.all.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
  }

  test("every oracle key has a query, and the surface is the declared size") {
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
    // SURVEY §2.1 declares the registered/oracle-checked counts; keep the
    // registry and the document in lockstep
    assert(Registry.all.size == 84, s"registered=${Registry.all.size}")
    assert(Registry.oracleSql.size == 83, s"oracle-checked=${Registry.oracleSql.size}")
  }
}
