package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Column DEFAULT values (Delta/ANSI `ALTER COLUMN … SET DEFAULT`
  * parity): stored as CURRENT_DEFAULT metadata in the schema sidecar,
  * applied to ABSENT columns at write time, versioned with the schema
  * (time travel / RESTORE / CLONE all see the defaults of their
  * version). Also pins the schema-sidecar carry that defaults exposed:
  * RESTORE returns the restored version's schema and CLONE copies the
  * source's, so metadata-only ADD COLUMNs travel correctly too.
  */
class DefaultsSpec extends SparkSpec {

  private def fresh(prefix: String): (GraftTable, String) = {
    val path = graft.GraftTmp.dir(prefix).toString
    (GraftTable(spark, path, Seq.empty), path)
  }

  private def seed(n: Int = 4) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"name_$i")).toDF("id", "name")
  }

  test("absent defaulted column completes on append; present passes through") {
    val (t, _) = fresh("def_basic")
    t.write(seed().withColumn("score", lit(1.5)))
    t.setColumnDefault("score", "2.5")
    assert(t.columnDefaults == Map("score" -> "2.5"))
    // omitted → default fills
    import spark.implicits._
    t.write(Seq((10L, "ten")).toDF("id", "name"), SaveMode.Append)
    val got = t.read().filter(col("id") === 10).select("score").head()
    assert(got.getDouble(0) == 2.5)
    // supplied → used as-is, never validated against the default
    t.write(Seq((11L, "eleven", 9.9)).toDF("id", "name", "score"),
      SaveMode.Append)
    assert(t.read().filter(col("id") === 11).head().getAs[Double]("score") == 9.9)
    // rows written BEFORE the default keep their own values
    assert(t.read().filter(col("id") === 1).head().getAs[Double]("score") == 1.5)
  }

  test("default casts to the column type; incompatible defaults rejected") {
    val (t, _) = fresh("def_cast")
    t.write(seed().withColumn("ts", lit(java.sql.Date.valueOf("2024-01-01"))))
    // string literal that casts to date is accepted (implicit ANSI cast)
    t.setColumnDefault("ts", "'2024-06-30'")
    import spark.implicits._
    t.write(Seq((20L, "x")).toDF("id", "name"), SaveMode.Append)
    assert(t.read().filter(col("id") === 20).head().getAs[java.sql.Date]("ts")
      == java.sql.Date.valueOf("2024-06-30"))
    // a default that cannot express the type fails at SET time
    val e = intercept[IllegalArgumentException] {
      t.setColumnDefault("ts", "'not-a-date'")
    }
    assert(e.getMessage.contains("does not cast"))
  }

  test("non-constant and unknown-column defaults rejected") {
    val (t, _) = fresh("def_req")
    t.write(seed())
    assert(intercept[IllegalArgumentException] {
      t.setColumnDefault("name", "id + 1") // column reference
    }.getMessage.contains("constant"))
    assert(intercept[IllegalArgumentException] {
      t.setColumnDefault("nope", "1")
    }.getMessage.contains("unknown column"))
  }

  test("DROP DEFAULT stops completion; existing values keep") {
    val (t, _) = fresh("def_drop")
    t.write(seed().withColumn("flag", lit(true)))
    t.setColumnDefault("flag", "false")
    import spark.implicits._
    t.write(Seq((30L, "thirty")).toDF("id", "name"), SaveMode.Append)
    t.dropColumnDefault("flag")
    assert(t.columnDefaults.isEmpty)
    // without the default, the omitted column is a schema mismatch again
    intercept[IllegalArgumentException] {
      t.write(Seq((31L, "y")).toDF("id", "name"), SaveMode.Append)
    }
    // the row that used the default keeps its value
    assert(t.read().filter(col("id") === 30).head().getAs[Boolean]("flag") == false)
  }

  test("SQL grammar: ALTER COLUMN SET/DROP DEFAULT via the parser") {
    val (t, path) = fresh("def_sql")
    t.write(seed().withColumn("qty", lit(7)))
    spark.sql(s"ALTER TABLE graft.`$path` ALTER COLUMN qty SET DEFAULT 42")
    assert(t.columnDefaults == Map("qty" -> "42"))
    import spark.implicits._
    t.write(Seq((40L, "forty")).toDF("id", "name"), SaveMode.Append)
    assert(t.read().filter(col("id") === 40).head().getAs[Int]("qty") == 42)
    spark.sql(s"ALTER TABLE graft.`$path` ALTER COLUMN qty DROP DEFAULT")
    assert(t.columnDefaults.isEmpty)
  }

  test("defaults are versioned: time travel and RESTORE see their version's") {
    val (t, _) = fresh("def_ver")
    t.write(seed().withColumn("v", lit(0L)))
    val preDefault = t.currentVersion
    t.setColumnDefault("v", "100")
    assert(t.defaultsOf(preDefault).isEmpty)
    assert(t.columnDefaults == Map("v" -> "100"))
    t.restore(preDefault)
    // RESTORE brought back the schema without the default
    assert(t.columnDefaults.isEmpty)
  }

  test("defaults survive RENAME COLUMN and travel with CLONE") {
    val (t, _) = fresh("def_ren")
    t.write(seed().withColumn("amount", lit(1.0)))
    t.setColumnDefault("amount", "3.25")
    t.renameColumn("amount", "total")
    assert(t.columnDefaults == Map("total" -> "3.25"))
    import spark.implicits._
    t.write(Seq((50L, "fifty")).toDF("id", "name"), SaveMode.Append)
    assert(t.read().filter(col("id") === 50).head().getAs[Double]("total") == 3.25)
    val clonePath = graft.GraftTmp.dir("def_clone").toString
    val c = t.shallowClone(clonePath)
    assert(c.columnDefaults == Map("total" -> "3.25"))
    c.write(Seq((51L, "fifty-one")).toDF("id", "name"), SaveMode.Append)
    assert(c.read().filter(col("id") === 51).head().getAs[Double]("total") == 3.25)
  }

  test("RESTORE across ADD COLUMN restores the pre-add schema") {
    val (t, _) = fresh("def_restore_add")
    t.write(seed())
    val preAdd = t.currentVersion
    t.addColumn("extra", org.apache.spark.sql.types.StringType)
    assert(t.read().columns.contains("extra"))
    t.restore(preAdd)
    assert(!t.read().columns.contains("extra"),
      "RESTORE must bring back the restored version's schema")
  }

  test("generated/identity columns cannot carry a default") {
    val (t, _) = fresh("def_gen")
    t.write(seed().withColumn("twice", col("id") * 2))
    t.addGeneratedColumn("twice", "id * 2")
    assert(intercept[IllegalArgumentException] {
      t.setColumnDefault("twice", "0")
    }.getMessage.contains("generated"))
  }
}
