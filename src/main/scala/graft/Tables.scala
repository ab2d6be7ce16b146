package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy handles over the driver-provided parquet tables for one scale-factor
  * directory (TESTDATA.md). Reads are plain parquet scans so Catalyst can push
  * filters and prune columns into the file source — never cache here; each
  * query should read only the columns it projects.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  def events: DataFrame     = load("events")
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}
