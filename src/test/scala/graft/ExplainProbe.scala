package graft

/** Ad-hoc plan inspection helper (test scope): prints the formatted plan of
  * named registered defs at sf0.001. Usage:
  *   sbt "Test/runMain graft.ExplainProbe d06_decontaminate q23_..."
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    args.foreach { name =>
      val df = SparkEntry.defs.find(_.name == name).getOrElse(sys.error(s"no def $name"))
        .run(spark, "/root/testdata/sf0.001")
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.takeWhile(!_.startsWith("===")).take(80).mkString("\n"))
    }
  }
}
