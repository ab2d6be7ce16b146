package graft.functions

import graft.SparkSpec
import graft.functions.PyTitle.pyTitle
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Standardization-table tests mirroring the reference's matrix
  * (/root/reference/tests/test_transform.py:41-105), plus seeded property
  * checks (no scalatest/scalacheck bridge in the offline cache, so the
  * property loops are hand-seeded).
  */
class PyTitleSpec extends SparkSpec {

  // Python `str.title()` ground truth for the cases the reference exercises
  // (and the apostrophe/digit edges initcap would get wrong).
  private val table = Seq(
    "hello world" -> "Hello World",
    "o'brien" -> "O'Brien",
    "o'brien & sons   no. 7" -> "O'Brien & Sons   No. 7",
    "d'angelo-smith 2x llc" -> "D'Angelo-Smith 2X Llc",
    "ALL CAPS MERCHANT" -> "All Caps Merchant",
    "123abc def" -> "123Abc Def",
    "a" -> "A",
    "" -> "",
    "  spaced  " -> "  Spaced  ",
    "tab\tsep" -> "Tab\tSep")

  private def t(x: String): String = PyTitle.title(UTF8String.fromString(x)).toString

  test("title matches Python str.title() on the standardization table") {
    table.foreach { case (in, want) => assert(t(in) == want, s"input '$in'") }
  }

  test("expression evaluates inside a DataFrame plan (codegen path)") {
    import spark.implicits._
    val got = table.map(_._1).toDF("s")
      .select(pyTitle(col("s")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == table.map(_._2))
  }

  test("null passes through") {
    import spark.implicits._
    val got = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(pyTitle(col("s"))).collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(None, Some("X")))
  }

  private val alphabet = "abcXYZ '2-.&\t"
  private def randomStrings(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length))).mkString)
  }

  test("property: idempotent (title(title(s)) == title(s)), 300 seeded samples") {
    randomStrings(42L, 300).foreach { s =>
      assert(t(t(s)) == t(s), s"input '$s'")
    }
  }

  test("property: case-insensitive inputs converge, 300 seeded samples") {
    randomStrings(7L, 300).foreach { s =>
      assert(t(s.toUpperCase) == t(s.toLowerCase), s"input '$s'")
    }
  }

  test("property: non-letters are preserved verbatim, 300 seeded samples") {
    randomStrings(13L, 300).foreach { s =>
      assert(t(s).filterNot(_.isLetter) == s.filterNot(_.isLetter), s"input '$s'")
    }
  }
}
