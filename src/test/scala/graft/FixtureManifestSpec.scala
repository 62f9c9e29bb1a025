package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-identity manifest (r12): the sf1 bench fixture is regenerable,
  * so round-over-round comparability rests on the manifest check — these
  * pin that the digest is order/partitioning-independent and that every
  * drift mode (row edit, row count, missing/extra table) fails loudly. */
class FixtureManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private def writeFixture(rows: Seq[(Long, String)], parts: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    rows.toDF("doc_id", "text").repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, "r1")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    dir
  }

  private val docs = (1L to 50L).map(i => (i, s"doc number $i")).toSeq

  test("digest is independent of row order and partition layout") {
    val a = writeFixture(docs, 1)
    val b = writeFixture(scala.util.Random.shuffle(docs), 7)
    val ma = FixtureManifest.compute(spark, a)
    val mb = FixtureManifest.compute(spark, b)
    assert(ma == mb, s"$ma vs $mb")
    // only tables present in the dir appear, in canonical order
    assert(ma.map(_._1) == Seq("region", "documents"))
    assert(ma.find(_._1 == "documents").get._2 == 50L)
  }

  test("check passes on a faithful fixture and raises on every drift mode") {
    val dir = writeFixture(docs, 3)
    val manifest = s"$dir/expected.manifest.json"
    FixtureManifest.write(spark, dir, manifest)
    FixtureManifest.check(spark, dir, manifest) // same data: silent

    // value edit, same row count: digest catches it
    val edited = writeFixture(docs.updated(10, (11L, "PERTURBED")), 3)
    val e1 = intercept[IllegalArgumentException](
      FixtureManifest.check(spark, edited, manifest))
    assert(e1.getMessage.contains("documents"), e1.getMessage)

    // dropped rows: count catches it
    val short = writeFixture(docs.take(49), 3)
    val e2 = intercept[IllegalArgumentException](
      FixtureManifest.check(spark, short, manifest))
    assert(e2.getMessage.contains("rows=50"), e2.getMessage)

    // missing table entirely
    val bare = java.nio.file.Files.createTempDirectory("graft_manifest_bare").toString
    docs.toDF("doc_id", "text")
      .write.parquet(s"$bare/documents.parquet")
    val e3 = intercept[IllegalArgumentException](
      FixtureManifest.check(spark, bare, manifest))
    assert(e3.getMessage.contains("region: missing"), e3.getMessage)

    // extra table the manifest never recorded
    Seq((1L, "x")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    val e4 = intercept[IllegalArgumentException](
      FixtureManifest.check(spark, dir, manifest))
    assert(e4.getMessage.contains("nation: not in manifest"), e4.getMessage)
  }

  test("manifest JSON round-trips through parse") {
    val entries = Seq(("documents", 50L, -1234567890123L), ("region", 1L, 42L))
    assert(FixtureManifest.parse(FixtureManifest.toJson(entries)) == entries)
  }
}
