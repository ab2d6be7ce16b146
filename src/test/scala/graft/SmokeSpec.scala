package graft

/** Executes EVERY registered def once at sf0.001 (noop-format write = full
  * physical plan, no driver collect), one named test per def — so a
  * provider-side data change (e.g. the round-9 events.parquet timestamp[us]
  * regeneration that silently broke e01–e07) surfaces as N named def
  * failures in seconds, locally, instead of via the driver's round artifact.
  *
  * Run standalone as the pre-suite gate: `sbt "testOnly graft.SmokeSpec"`
  * (documented in SURVEY §8).
  */
class SmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registry def names are unique (a duplicate silently drops a def from SparkEntry.queries)") {
    val names = SparkEntry.defs.map(_.name)
    val dups = names.diff(names.distinct)
    assert(dups.isEmpty, s"duplicate def names: ${dups.mkString(", ")}")
  }

  SparkEntry.defs.foreach { d =>
    test(s"smoke: ${d.name} executes at sf0.001") {
      d.run(spark, sf).write.format("noop").mode("overwrite").save()
    }
  }
}
