package graft.cli

import graft.SparkSpec

/** Reference-format table rendering (src/run_queries.py:78-127 twin):
  * width clamps, float/NULL rendering, truncation, row cap.
  */
class DisplaySpec extends SparkSpec {

  import spark.implicits._

  test("column widths clamp to [10, 50] and pad with ljust") {
    val lines = Display.formatTable(
      Seq("id", "name"),
      Seq(Seq("1", "a"), Seq("2", "bb")))
    // both columns clamp UP to 10; cells joined with " | "
    assert(lines(0) == "id".padTo(10, ' ') + " | " + "name".padTo(10, ' '))
    assert(lines(1) == "-" * lines(0).length)
    assert(lines(2) == "1".padTo(10, ' ') + " | " + "a".padTo(10, ' '))
  }

  test("oversized values truncate to width-3 plus ellipsis at the 50 clamp") {
    val long = "x" * 80
    val lines = Display.formatTable(Seq("c"), Seq(Seq(long)))
    assert(lines(2) == "x" * 47 + "...")
    assert(lines(2).length == 50)
  }

  test("width derives from the longest value under the clamp") {
    val lines = Display.formatTable(
      Seq("c"), Seq(Seq("abcdefghijklmnop"))) // 16 chars: between 10 and 50
    assert(lines(0) == "c".padTo(16, ' '))
    assert(lines(2) == "abcdefghijklmnop")
  }

  test("printTable renders floats %.2f, NULL, the cap trailer and row footer") {
    val df = spark.range(120).selectExpr(
      "id", "cast(id as double) / 3 AS ratio",
      "CASE WHEN id % 2 = 0 THEN NULL ELSE 'v' END AS maybe")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Display.printTable(df.orderBy("id"))
    }
    val s = out.toString("UTF-8")
    assert(s.contains("0.33"), "floats must render %.2f")
    assert(s.contains("NULL"), "nulls must render as NULL")
    assert(s.contains("... (showing first 100 of 120 rows)"))
    assert(s.contains("Rows returned: 120"))
    // exactly 100 data lines between the separator and the trailer
    val lines = s.split("\n")
    val sep = lines.indexWhere(_.startsWith("---"))
    assert(lines.slice(sep + 1, sep + 101).forall(_.contains(" | ")))
    assert(!lines(sep + 101).contains(" | "))
  }

  test("a --limit above the default cap prints every fetched row (ADVICE r6)") {
    val df = spark.range(150).selectExpr("id")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Display.printTable(df.orderBy("id"), cap = 120)
    }
    val s = out.toString("UTF-8")
    assert(s.contains("... (showing first 120 of 150 rows)"))
    val lines = s.split("\n")
    val sep = lines.indexWhere(_.startsWith("---"))
    // the body, trailer, and footer must agree: 120 data lines, not 100
    val body = lines.slice(sep + 1, sep + 121)
    assert(body.forall(l => l.trim.nonEmpty && l.trim.forall(_.isDigit)),
      "rows 101..120 must print when the caller raised the cap")
    assert(body.last.trim == "119", s"last printed row: '${body.last.trim}'")
    assert(lines(sep + 121).trim.isEmpty, "exactly 120 body lines")
  }

  test("printTable under the cap: no trailer, exact footer, no extra count job") {
    val df = spark.range(3).selectExpr("id")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Display.printTable(df)
    }
    val s = out.toString("UTF-8")
    assert(s.contains("Rows returned: 3"))
    assert(!s.contains("showing first"))
  }

  test("empty result prints only the zero footer") {
    val df = spark.range(1).filter("id < 0").toDF()
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Display.printTable(df)
    }
    assert(out.toString("UTF-8").trim == "Rows returned: 0")
  }
}
