package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaSpec extends SparkSpec {
  import spark.implicits._

  private val entity = GraftSchema("Entity", 1, Seq("id"),
    StructType(Seq(StructField("id", LongType), StructField("name", StringType))))

  private val customer = GraftSchema("Customer", 1, Seq("c_custkey"),
    StructType(Seq(StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType))),
    implementsMaps = Map("Entity" -> Seq(
      ("c_custkey", "id", "bigint"), ("c_name", "name", "string"))))

  test("conform projects and casts to the declared struct") {
    val df = Seq((1, "a", "2.5")).toDF("c_custkey", "c_name", "c_acctbal")
    val out = customer.conform(df)
    // nullability follows the source data; names/types follow the schema
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      customer.struct.map(f => (f.name, f.dataType)))
    assert(out.collect().head.getDouble(2) == 2.5)
  }

  test("conform rejects frames missing declared fields") {
    val df = Seq((1, "a")).toDF("c_custkey", "c_name")
    intercept[IllegalArgumentException](customer.conform(df))
  }

  test("castTo maps onto an implemented schema") {
    val df = Seq((1L, "a", 2.5)).toDF("c_custkey", "c_name", "c_acctbal")
    val out = customer.castTo("Entity", df)
    assert(out.columns.toSeq == Seq("id", "name"))
    assert(entity.conform(out).count() == 1)
  }

  test("latestView dedupes on the schema's uniqueOn key") {
    import org.apache.spark.sql.functions.col
    val b1 = Seq((1L, "old", 1.0), (2L, "x", 2.0)).toDF("c_custkey", "c_name", "c_acctbal")
      .withColumn("v", col("c_acctbal"))
    val b2 = Seq((1L, "new", 9.0)).toDF("c_custkey", "c_name", "c_acctbal")
      .withColumn("v", col("c_acctbal"))
    val out = customer.latestView(Seq(b1, b2), Seq(col("v").desc))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "new", 2L -> "x"))
  }

  test("castTo rejects unimplemented targets") {
    val df = Seq((1L, "a", 2.5)).toDF("c_custkey", "c_name", "c_acctbal")
    intercept[IllegalArgumentException](customer.castTo("Unknown", df))
  }
}
