package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL ingestion contract: explicit schema (no inference), missing/extra
  * field tolerance, nested flattening, and PERMISSIVE corrupt-line capture.
  * Cross-engine exactness of the fixture read is oracle c03.
  */
class JsonlExtractSpec extends SparkSpec {

  private val fixture = "/root/repo/fixtures/documents_a.jsonl"

  test("fixture reads 10 docs; missing lang defaults to 'und'; extra field tolerated") {
    val out = JsonlExtract.normalizeDocuments(
      JsonlExtract.readDocuments(spark, fixture)).orderBy("doc_id").collect()
    assert(out.length == 10)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(9004L).getAs[String]("lang") == "und")
    assert(byId(9006L).getAs[String]("lang") == "en") // "score" extra field ignored
    assert(byId(9005L).getAs[String]("url") == null)   // meta present, url missing
    assert(byId(9008L).getAs[String]("crawl") == null) // meta absent entirely
    assert(byId(9001L).getAs[Int]("n_tokens") == 9)
  }

  test("malformed lines land in _corrupt_record and are excluded from the clean side") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val p = s"$dir/bad.jsonl"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      ("""{"doc_id": 1, "text": "good line", "lang": "en", "source": "t"}""" + "\n" +
        """{"doc_id": 2, "text": "truncated""" + "\n" +
        """{"doc_id": 3, "text": "also good", "source": "t"}""" + "\n")
        .getBytes("UTF-8"))
    val raw = JsonlExtract.readDocuments(spark, p)
    // Spark 4 partial-results parsing gives the truncated line a non-null
    // doc_id (2) AND a populated _corrupt_record — it must still quarantine.
    assert(JsonlExtract.corruptLines(raw).count() == 1)
    val clean = JsonlExtract.normalizeDocuments(raw)
    assert(clean.count() == 2)
    assert(clean.filter(col("lang") === "und").count() == 1) // doc 3
  }

  test("clean ∪ quarantine ∪ rejects partitions every input line exactly once") {
    val raw = JsonlExtract.readDocuments(spark, fixture)
    val total = raw.count()
    val clean = JsonlExtract.normalizeDocuments(raw).count()
    val quarantined = JsonlExtract.corruptLines(raw).count()
    val rejected = JsonlExtract.rejectedLines(raw).count()
    assert(total == 12) // 10 good + 1 truncated + 1 well-formed-null-key
    assert(clean == 10)
    assert(quarantined == 1)
    assert(rejected == 1)
    assert(clean + quarantined + rejected == total)
    // the quarantine keeps the raw line for profiling (doc_id rides along;
    // whether it parsed depends on how the line broke — truncation → null,
    // type-mismatch → partial result)
    val bad = JsonlExtract.corruptLines(raw).collect()
    assert(bad.head.getAs[String]("_corrupt_record").contains("9011"))
  }
}
