package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested Avro container support — records, arrays, maps, and their
  * compositions, including logical types INSIDE nesting. This is
  * beyond the reference's flat-record boundary (README.md:248-252
  * names nesting as future work; AvroSCDInputFormat.java:178 throws);
  * SURVEY §1.2 sanctions supporting it on Spark. DML replay stays
  * flat — nested columns pass through untouched. */
class AvroNestedSpec extends SparkSpec {

  private def roundTrip(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("avronest").toString + "/t"
    AvroSource.write(df, dir)
    AvroSource.read(spark, dir)
  }

  test("struct column round-trips with schema and values intact") {
    import spark.implicits._
    val src = Seq((1L, ("alice", 30)), (2L, ("bob", 40)))
      .toDF("id", "person")
      .select(col("id"), col("person").cast("struct<name:string,age:int>"))
    val back = roundTrip(src).orderBy("id")
    assert(back.schema("person").dataType.isInstanceOf[StructType])
    val got = back.collect().map(r =>
      (r.getLong(0), r.getStruct(1).getString(0), r.getStruct(1).getInt(1)))
    assert(got.toSeq == Seq((1L, "alice", 30), (2L, "bob", 40)))
  }

  test("array and map columns round-trip, including empties and NULLs") {
    import spark.implicits._
    val src = Seq(
      (1L, Seq(1, 2, 3), Map("a" -> 1.5, "b" -> -2.0)),
      (2L, Seq.empty[Int], Map.empty[String, Double]))
      .toDF("id", "xs", "m")
      .unionByName(Seq((3L, null.asInstanceOf[Seq[Int]],
        null.asInstanceOf[Map[String, Double]])).toDF("id", "xs", "m"))
    val back = roundTrip(src).orderBy("id").collect()
    assert(back(0).getSeq[Int](1) == Seq(1, 2, 3))
    assert(back(0).getMap[String, Double](2) == Map("a" -> 1.5, "b" -> -2.0))
    assert(back(1).getSeq[Int](1).isEmpty)
    assert(back(1).getMap[String, Double](2).isEmpty)
    assert(back(2).isNullAt(1) && back(2).isNullAt(2))
  }

  test("array of structs with a decimal inside round-trips bit-exact") {
    import spark.implicits._
    val src = Seq(
      (1L, Seq(("x", "12.345"), ("y", "-0.001"))),
      (2L, Seq.empty[(String, String)]))
      .toDF("id", "items")
      .select(col("id"), expr(
        "transform(items, it -> named_struct(" +
          "'sku', it._1, 'price', CAST(it._2 AS DECIMAL(9,3))))")
        .as("items"))
    val back = roundTrip(src).orderBy("id")
    val itemsType = back.schema("items").dataType.asInstanceOf[ArrayType]
    val st = itemsType.elementType.asInstanceOf[StructType]
    assert(st("price").dataType == DecimalType(9, 3))
    val r0 = back.collect()(0).getSeq[Row](1)
    assert(r0.map(r => (r.getString(0), r.getDecimal(1).toPlainString))
      == Seq(("x", "12.345"), ("y", "-0.001")))
  }

  test("doubly nested struct with nullable inner field") {
    import spark.implicits._
    val src = Seq((1L, (("deep", 7), 1.0)), (2L, ((null: String, 0), 2.0)))
      .toDF("id", "outer")
      .select(col("id"), col("outer").cast(
        "struct<inner:struct<tag:string,n:int>,w:double>"))
    val back = roundTrip(src).orderBy("id").collect()
    assert(back(0).getStruct(1).getStruct(0).getString(0) == "deep")
    assert(back(1).getStruct(1).getStruct(0).isNullAt(0))
    assert(back(1).getStruct(1).getDouble(1) == 2.0)
  }

  test("SCD DML on flat columns leaves nested columns untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avronestscd").toString + "/t"
    val src = Seq((1L, "a", Seq(10, 20)), (2L, "b", Seq(30)))
      .toDF("id", "status", "xs")
    AvroSource.write(src, dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".updates"),
      "UPDATE t SET status = 'z' WHERE id = 1;\n")
    val out = graft.scd.ScdReader.read(spark, dir, format = "avro")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("status") == "z")
    assert(out(0).getAs[scala.collection.Seq[Int]]("xs") == Seq(10, 20))
    assert(out(1).getAs[String]("status") == "b")
    assert(out(1).getAs[scala.collection.Seq[Int]]("xs") == Seq(30))
  }

  test("enum fields read as their symbol strings") {
    // hand-built enum file: the write bridge never emits enums (Spark
    // has no enum type), but foreign writers do
    val schemaJson =
      """{"type":"record","name":"r","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"color","type":{"type":"enum","name":"c",
        |   "symbols":["RED","GREEN"]}}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val dir = Files.createTempDirectory("avroenum").toString
    val f = new java.io.File(dir, "data.avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, f)
    val r1 = new org.apache.avro.generic.GenericData.Record(schema)
    r1.put("id", 1L)
    r1.put("color",
      new org.apache.avro.generic.GenericData.EnumSymbol(
        schema.getField("color").schema(), "RED"))
    w.append(r1)
    w.close()
    val back = AvroSource.read(spark, dir).collect()
    assert(back.head.getString(1) == "RED")
  }
}
