package graft
import org.apache.spark.sql.SparkSession
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      df.printSchema()
      df.show(3, false)
      println("LENIENT_READ_OK")
    } catch { case e: Throwable => println("LENIENT_READ_FAIL: " + e.getMessage.take(500)) }
    spark.stop()
  }
}
