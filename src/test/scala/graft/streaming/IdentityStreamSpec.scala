package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class IdentityStreamSpec extends SparkSpec {
  import spark.implicits._

  private def put(dir: String, name: String, lines: String*): Unit =
    Files.writeString(Paths.get(dir, name), lines.mkString("\n"))

  private def assignments(store: String): Map[String, String] =
    IdentityStream.readAssignments(spark, store)
      .as[(String, String)].collect().toMap

  test("bridging edge merges two existing clusters across batches") {
    val in = Files.createTempDirectory("id-in").toString
    val store = Files.createTempDirectory("id-store").toString
    val ckpt = Files.createTempDirectory("id-ckpt").toString

    // batch 1: two separate clusters {alice, anon-1} and {bob, anon-2}
    put(in, "1.json",
      """{"_p": "alice", "_p2": "anon-1", "_n": "alias", "_t": "1700000000"}""",
      """{"_p": "bob", "_p2": "anon-2", "_n": "alias", "_t": "1700000001"}""")
    IdentityStream.run(spark, in, store, ckpt).awaitTermination()
    val a1 = assignments(store)
    assert(a1("anon-1") == a1("alice"))
    assert(a1("anon-2") == a1("bob"))
    assert(a1("alice") != a1("bob"))

    // batch 2: one event bridges the clusters (the reference's G2
    // LIMIT-1 resolve would leave them separate)
    put(in, "2.json",
      """{"_p": "anon-1", "_p2": "anon-2", "_n": "alias", "_t": "1700000100"}""")
    IdentityStream.run(spark, in, store, ckpt).awaitTermination()
    val a2 = assignments(store)
    assert(a2.values.toSet.size == 1, s"expected one cluster, got $a2")
    assert(a2("bob") == a2("alice") && a2("anon-2") == a2("alice"))
    // canonical = min string of the merged cluster
    assert(a2("alice") == "alice")
  }

  test("batches without alias edges leave the store untouched") {
    val in = Files.createTempDirectory("id2-in").toString
    val store = Files.createTempDirectory("id2-store").toString
    val ckpt = Files.createTempDirectory("id2-ckpt").toString
    put(in, "1.json",
      """{"_p": "carol", "_n": "view", "_t": "1700000000"}""")
    IdentityStream.run(spark, in, store, ckpt).awaitTermination()
    assert(assignments(store).isEmpty)
  }
}
