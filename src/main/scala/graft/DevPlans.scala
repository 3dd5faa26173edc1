package graft
import org.apache.spark.sql.SparkSession
object DevPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Registry.all.keys.toSeq.sorted
    names.foreach { n =>
      val df = Registry.all(n).fn(spark, "/root/testdata/sf0.001")
      println(s"=== $n")
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.startsWith("(1) Scan") ||
        l.contains("ReadSchema")).foreach(l => println("  " + l.take(180)))
    }
    spark.stop()
  }
}
