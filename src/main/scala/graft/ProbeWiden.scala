package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object ProbeWiden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("widen").toString
    spark.range(0, 10).select($"id".cast("int").as("a"), $"id".cast("float").as("f"),
      $"id".cast("short").as("s"), ($"id"*10).cast("decimal(5,1)").as("dc")).write.parquet(s"$d/p")
    def tryRead(sc: StructType, tag: String): Unit =
      try {
        val r = spark.read.schema(sc).parquet(s"$d/p").agg(sum($"a"), sum($"f")).head()
        println(s"OK $tag -> $r")
      } catch { case e: Throwable => println(s"FAIL $tag -> ${e.getMessage.take(200)}") }
    tryRead(StructType(Seq(StructField("a", LongType), StructField("f", DoubleType),
      StructField("s", IntegerType), StructField("dc", DecimalType(10,1)))), "int->long,float->double,short->int,dec widen")
    // vectorized off comparison
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    tryRead(StructType(Seq(StructField("a", LongType), StructField("f", DoubleType),
      StructField("s", IntegerType), StructField("dc", DecimalType(10,1)))), "row reader")
    spark.stop()
  }
}
