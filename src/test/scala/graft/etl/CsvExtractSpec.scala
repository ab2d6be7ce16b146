package graft.etl

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Extract tests mirroring /root/reference/tests/test_extract.py: file probe
  * (:24-65), structure validation incl extra-columns tolerance (:72-108),
  * error matrix (:150-163), round-trip (:167-184), 1000-row file (:186-207).
  */
class CsvExtractSpec extends SparkSpec {

  private def tmpCsv(content: String): String = {
    val p: Path = Files.createTempFile("graft-csv", ".csv")
    Files.writeString(p, content)
    p.toFile.deleteOnExit()
    p.toString
  }

  private val header = "transaction_id,date,category,amount,merchant,payment_method,user_id"

  test("file metadata probe reports size and existence") {
    val p = tmpCsv(s"$header\nT1,1996-05-07,groceries,1.00,m,cash,1\n")
    val meta = CsvExtract.fileMeta(p)
    assert(meta.exists && meta.sizeBytes > 0 && meta.modifiedMs > 0)
    assert(!CsvExtract.fileMeta("/nonexistent/file.csv").exists)
  }

  test("extraction round-trips values as strings with file-order seq") {
    val p = tmpCsv(s"$header\nT1,1996-05-07,groceries,12.34,acme,cash,42\nT2,1996-05-08,dining,5.00,zebra,cash,7\n")
    val df = CsvExtract.extract(spark, p).orderBy("seq").collect()
    assert(df.length == 2)
    assert(df(0).getAs[String]("transaction_id") == "T1")
    assert(df(0).getAs[String]("amount") == "12.34")
    assert(df(1).getAs[String]("merchant") == "zebra")
  }

  test("extra columns are tolerated and preserved") {
    val p = tmpCsv(s"$header,extra_notes\nT1,1996-05-07,groceries,1.00,m,cash,1,hello\n")
    val df = CsvExtract.extract(spark, p)
    val report = CsvExtract.validateStructure(df)
    assert(report.missingColumns.isEmpty)
    assert(report.extraColumns == Seq("extra_notes"))
    assert(df.select("extra_notes").collect()(0).getString(0) == "hello")
  }

  test("missing required columns abort extraction") {
    val p = tmpCsv("transaction_id,date\nT1,1996-05-07\n")
    val e = intercept[ExtractError](CsvExtract.extract(spark, p))
    assert(e.getMessage.contains("missing required columns"))
    assert(e.getMessage.contains("amount"))
  }

  test("header-only file aborts with empty error") {
    val p = tmpCsv(s"$header\n")
    val e = intercept[ExtractError](CsvExtract.extract(spark, p))
    assert(e.getMessage.contains("no data rows"))
  }

  test("nonexistent file aborts") {
    assertThrows[ExtractError](CsvExtract.extract(spark, "/nonexistent/x.csv"))
  }

  test("all-null rows are counted, not dropped") {
    val p = tmpCsv(s"$header\nT1,1996-05-07,groceries,1.00,m,cash,1\n,,,,,,\n")
    val df = CsvExtract.extract(spark, p)
    assert(CsvExtract.validateStructure(df).allNullRows == 1)
    assert(df.count() == 2)
  }

  test("null profile reports per-column counts and percentages") {
    val p = tmpCsv(s"$header\nT1,,groceries,1.00,m,cash,1\nT2,1996-05-07,,2.00,m,cash,1\n")
    val prof = CsvExtract.nullProfile(CsvExtract.extract(spark, p))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(prof("date") == (1L, 50.0))
    assert(prof("category") == (1L, 50.0))
    assert(prof("transaction_id") == (0L, 0.0))
  }

  test("readBatch: keep-first dedup holds ACROSS files in batch order") {
    val a = tmpCsv(s"$header\nT1,1996-05-07,groceries,12.34,acme,cash,42\nT2,1996-05-08,dining,5.00,zebra,cash,7\n")
    val b = tmpCsv(s"$header\nT1,1996-05-07,groceries,99.99,acme,cash,42\nT3,1996-05-09,travel,8.00,zebra,cash,9\n")
    val valid = TxnPipeline.cleanValid(CsvExtract.readBatch(spark, Seq(a, b)))
      .orderBy("transaction_id").collect()
    assert(valid.map(_.getAs[String]("transaction_id")).toSeq == Seq("T1", "T2", "T3"))
    // file A's copy of T1 wins, not file B's 99.99
    assert(valid(0).getAs[Double]("amount") == 12.34)
    // reversed batch order flips the winner — order is the caller's contract
    val reversed = TxnPipeline.cleanValid(CsvExtract.readBatch(spark, Seq(b, a)))
      .filter(col("transaction_id") === "T1").collect()
    assert(reversed(0).getAs[Double]("amount") == 99.99)
  }

  test("readBatch tolerates differing extra columns across files") {
    val a = tmpCsv(s"$header,notes\nT1,1996-05-07,groceries,1.00,m,cash,1,hi\n")
    val b = tmpCsv(s"$header\nT2,1996-05-08,dining,2.00,m,cash,2\n")
    val batch = CsvExtract.readBatch(spark, Seq(a, b)).orderBy("seq").collect()
    assert(batch.length == 2)
    assert(batch(0).getAs[String]("notes") == "hi")
    assert(batch(1).getAs[String]("notes") == null)
  }

  test("1000-row file extracts completely and feeds the pipeline") {
    val rows = (1 to 1000).map(i =>
      f"T$i%d,1996-05-${(i % 28) + 1}%02d,groceries,${i % 100}%d.50,merchant $i%d,cash,${i % 10}%d")
      .mkString("\n")
    val p = tmpCsv(s"$header\n$rows\n")
    val df = CsvExtract.extract(spark, p)
    assert(df.count() == 1000)
    val valid = TxnPipeline.cleanValid(df)
    // rows with amount 0.50 (i%100==0) are valid (>0); all others too
    assert(valid.count() == 1000)
  }
}
