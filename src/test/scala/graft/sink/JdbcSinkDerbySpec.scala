package graft.sink

import java.sql.DriverManager

import graft.SparkSpec

/** Live end-to-end sink test against embedded Derby (ships with Spark):
  * create, partition-parallel transactional insert, schema-evolve on a
  * second write with new columns, read back over plain JDBC.
  */
object JdbcSinkDerbySpec {
  // top-level so the connect closure shipped to executors captures nothing
  // but this static reference (the spec instance is not serializable)
  val url = "jdbc:derby:memory:graftdb;create=true"
  def connect(): java.sql.Connection = DriverManager.getConnection(url)
}

class JdbcSinkDerbySpec extends SparkSpec {
  import spark.implicits._
  import JdbcSinkDerbySpec.url

  test("writeEvolving creates, inserts, evolves, appends") {
    val connect: () => java.sql.Connection = JdbcSinkDerbySpec.connect _

    val batch1 = Seq(("alice", 1L), ("bob", 2L)).toDF("person", "n")
    JdbcSink.writeEvolving(batch1, "tb_event", connect, maxVarchar = 4000)

    val batch2 = Seq(("carol", 3L, 9.5)).toDF("person", "n", "score")
    JdbcSink.writeEvolving(batch2, "tb_event", connect, maxVarchar = 4000)

    val conn = connect()
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT "person", "n", "score" FROM "tb_event" ORDER BY "n"""")
      val rows = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getString(1), r.getLong(2),
          Option(r.getObject(3)).map(_.asInstanceOf[Double])))
        .toList
      assert(rows == List(
        ("alice", 1L, None), // pre-evolution rows read NULL for the new col
        ("bob", 2L, None),
        ("carol", 3L, Some(9.5))))
    } finally conn.close()
  }
}
