package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import graft.table.GraftTable

/** Schema-in-the-log (Delta metadata-action parity): every commit
  * records the physical schema, which makes file-less tables
  * well-defined — SQL CREATE TABLE before any data, ALTER TABLE ADD
  * COLUMN with null alignment, and schema-stable truncation.
  */
class SchemaLogSpec extends SparkSpec {
  import spark.implicits._

  test("SQL CREATE TABLE establishes schema + layout; INSERT INTO is enforced") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val path = graft.GraftTmp.dir("slog_create").toString + "/t"
    spark.sql(
      s"""CREATE TABLE graft.`$path` (id BIGINT, v DOUBLE, cat STRING)
         |PARTITIONED BY (cat)""".stripMargin)

    // readable while empty, with the declared schema
    val empty = spark.sql(s"SELECT * FROM graft.`$path`")
    assert(empty.count() == 0)
    assert(empty.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      Seq("id" -> LongType, "v" -> DoubleType, "cat" -> StringType))

    // double-create rejected
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$path` (x INT)")
    }

    // first INSERT is schema-enforced (wrong column count fails)
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$path` SELECT 1")
    }
    spark.sql(s"INSERT INTO graft.`$path` VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    assert(spark.sql(s"SELECT * FROM graft.`$path`").count() == 2)
    // hive layout came from the CREATE's PARTITIONED BY
    val t = GraftTable(spark, path)
    assert(t.manifestFiles().forall(_.contains("cat=")), t.manifestFiles())
    // type enforcement holds on later writes
    intercept[Exception] {
      GraftTable(spark, path, Seq("cat"))
        .write(Seq(("x", 1.0, "c")).toDF("id", "v", "cat"),
          org.apache.spark.sql.SaveMode.Append)
    }
  }

  test("ADD COLUMN aligns in as nulls; writes populate; no resurrection after drop") {
    val path = graft.GraftTmp.dir("slog_addcol").toString
    val t = GraftTable(spark, path, Nil)
    t.write(spark.range(0, 10).toDF("id").withColumn("v", col("id") * 2.0))
    val vBefore = t.currentVersion

    t.addColumn("score", DoubleType)
    val r = t.read()
    assert(r.columns.toSeq == Seq("id", "v", "score"))
    assert(r.filter(col("score").isNotNull).count() == 0)
    // time travel: pre-add version has no such column
    assert(!t.readVersion(vBefore).columns.contains("score"))

    // writes populate the new column; old rows stay null
    t.write(Seq((100L, 1.0, 9.9)).toDF("id", "v", "score"),
      org.apache.spark.sql.SaveMode.Append)
    assert(t.read().filter(col("score") === 9.9).count() == 1)
    assert(t.read().filter(col("score").isNull).count() == 10)

    // drop then re-add the same name: the old values must NOT resurrect
    t.dropColumn("score")
    assert(!t.read().columns.contains("score"))
    t.addColumn("score", DoubleType)
    assert(t.read().filter(col("score").isNotNull).count() == 0,
      "re-added column must start empty")
    // and pruning/metadata counts still work
    assert(t.count() == 11)
  }

  test("SQL ALTER TABLE ADD/RENAME/DROP COLUMN route to the metadata commits") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val path = graft.GraftTmp.dir("slog_alter").toString
    val t = GraftTable(spark, path, Nil)
    t.write(spark.range(0, 5).toDF("id").withColumn("v", col("id") * 1.5))

    spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMN note STRING")
    assert(t.read().columns.toSeq == Seq("id", "v", "note"))
    assert(spark.sql(s"SELECT * FROM graft.`$path` WHERE note IS NULL").count() == 5)

    spark.sql(s"ALTER TABLE graft.`$path` RENAME COLUMN v TO price")
    assert(spark.sql(s"SELECT price FROM graft.`$path`").count() == 5)

    spark.sql(s"ALTER TABLE graft.`$path` DROP COLUMN note")
    assert(t.read().columns.toSeq == Seq("id", "price"))
    // unsupported change kinds fail clearly
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$path` ALTER COLUMN id TYPE STRING")
    }
  }

  test("API create + truncation keeps the recorded schema without probing history") {
    val path = graft.GraftTmp.dir("slog_api").toString
    val t = GraftTable.create(spark, path,
      new org.apache.spark.sql.types.StructType()
        .add("k", LongType).add("s", StringType))
    assert(t.read().count() == 0)
    assert(t.read().columns.toSeq == Seq("k", "s"))
    t.write(Seq((1L, "x"), (2L, "y")).toDF("k", "s"),
      org.apache.spark.sql.SaveMode.Append)
    t.delete(lit(true))
    assert(t.read().count() == 0)
    assert(t.read().columns.toSeq == Seq("k", "s"))
    // schema survives log cleanup of the data-bearing versions
    t.cleanupLog(keepVersions = 1)
    assert(t.read().columns.toSeq == Seq("k", "s"))
  }

  test("CREATE TABLE AS SELECT materializes through the catalog") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val path = graft.GraftTmp.dir("graft_ctas").toString
    spark.sql(
      s"CREATE TABLE graft.`$path` AS SELECT id, id % 3 AS g FROM range(30)")
    val t = graft.table.GraftTable(spark, path)
    assert(t.currentVersion >= 0)
    assert(t.read().count() == 30)
    assert(spark.sql(s"SELECT sum(g) FROM graft.`$path`")
      .collect()(0).getLong(0) == 30)
    // partitioned CTAS lays out hive directories
    val p2 = graft.GraftTmp.dir("graft_ctas_p").toString
    spark.sql(s"CREATE TABLE graft.`$p2` PARTITIONED BY (g) AS " +
      "SELECT id, id % 3 AS g FROM range(30)")
    val t2 = graft.table.GraftTable(spark, p2)
    assert(t2.read().count() == 30)
    assert(t2.manifestFiles().forall(_.contains("g=")))
  }
}
