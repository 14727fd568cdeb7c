package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.nio.file.Files

/** Per-partition Avro reader-schema resolution (reference parity:
  * AvroSCDInputFormat.java:70-121 resolves each split's partition info
  * so different partitions can carry different Avro properties). Two
  * partitions written under DIFFERENT schema versions must read back
  * as one coherent table, with per-partition reader defaults. */
class AvroPartitionedSpec extends SparkSpec {

  import spark.implicits._

  /** seg=old written with (id, name); seg=new with (id, name, extra). */
  private def writeTable(): String = {
    val dir = Files.createTempDirectory("avropart").toString
    AvroSource.write(
      Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1),
      s"$dir/seg=old")
    AvroSource.write(
      Seq((3L, "c", "x")).toDF("id", "name", "extra").coalesce(1),
      s"$dir/seg=new")
    // drop the _SUCCESS markers the hadoop committer leaves
    dir
  }

  test("schema-divergent partitions union by name with nulled gaps") {
    val dir = writeTable()
    val df = AvroSource.readPartitioned(spark, dir)
    assert(df.columns.toSet == Set("id", "name", "extra", "seg"))
    val got = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("extra"), r.getAs[String]("seg")))
    assert(got.toSeq == Seq((1L, null, "old"), (2L, null, "old"),
      (3L, "x", "new")))
  }

  test("per-partition reader schema: default materializes only where mapped") {
    val dir = writeTable()
    val oldReader =
      """{"type":"record","name":"r","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":"string"},
        |  {"name":"extra","type":"string","default":"legacy"}
        |]}""".stripMargin
    val df = AvroSource.readPartitioned(spark, dir,
      readerSchemaFor = Map("seg=old" -> oldReader))
    val got = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("extra")))
    // old rows resolve the reader default; new rows keep real data
    assert(got.toSeq == Seq((1L, "legacy"), (2L, "legacy"), (3L, "x")))
  }

  test("full reference scenario: per-partition schemas AND per-partition DML compose") {
    // the complete Hive shape the reference serves: a partitioned Avro
    // table whose partitions differ in BOTH reader schema and sidecar
    // log — readPartitioned resolves the schemas, applyLogFile scopes
    // each partition's statements to its own rows
    val dir = writeTable()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "seg=old", ".updates"),
      "UPDATE t SET name = 'patched' WHERE id = 1;\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "seg=new", ".updates"),
      "DELETE FROM t WHERE id = 3;\n")
    val base = AvroSource.readPartitioned(spark, dir)
    val view = graft.scd.ScdReader.applyLogFile(spark, base, dir, None)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[String]("seg")))
    // old partition's UPDATE fired on its row only; new partition's
    // DELETE removed id 3; schema union (extra) intact throughout
    assert(view.toSeq == Seq((1L, "patched", "old"), (2L, "b", "old")))
  }

  test("ScdReader.read(format=avro) serves the partitioned table directly") {
    // the main entry point, not the hand-composed form: loadBase must
    // route partitioned Avro through readPartitioned so partition
    // columns resolve and the per-partition guard can reference them
    val dir = writeTable()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "seg=old", ".updates"),
      "UPDATE t SET name = 'patched' WHERE id = 1;\n")
    val view = graft.scd.ScdReader.read(spark, dir, format = "avro")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[String]("seg")))
    assert(view.toSeq == Seq((1L, "patched", "old"), (2L, "b", "old"),
      (3L, "c", "new")))
  }

  test("pruned reader schema keeps field aliases (rename resolution)") {
    val dir = writeTable() // writer field is `name`
    val renames =
      """{"type":"record","name":"record","namespace":"graft.avro",
        |"fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"title","type":"string","aliases":["name"]}
        |]}""".stripMargin
    // unpruned: alias matches the writer's `name` data
    val full = AvroSource.read(spark, s"$dir/seg=old", Some(renames))
      .orderBy("id").collect().map(_.getString(1))
    assert(full.toSeq == Seq("a", "b"))
    // pruned to the renamed column: the alias must survive pruning or
    // the resolver silently stops matching the writer field
    val pruned = AvroSource.read(spark, s"$dir/seg=old", Some(renames),
      columns = Some(Seq("title")))
      .collect().map(_.getString(0)).sorted
    assert(pruned.toSeq == Seq("a", "b"))
  }

  test("Hive default-partition sentinel reads back as real NULL; its sidecar fires") {
    val dir = writeTable()
    AvroSource.write(
      Seq((9L, "z")).toDF("id", "name").coalesce(1),
      s"$dir/seg=__HIVE_DEFAULT_PARTITION__")
    val df = AvroSource.readPartitioned(spark, dir)
    assert(df.where(col("seg").isNull).count() == 1,
      "sentinel partition must surface as NULL, not as the literal string")
    // and the NULL partition's own sidecar guards correctly (isNull)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "seg=__HIVE_DEFAULT_PARTITION__",
        ".updates"),
      "UPDATE t SET name = 'nulled' WHERE id = 9;\n")
    val view = graft.scd.ScdReader.read(spark, dir, format = "avro")
    assert(view.where(col("id") === 9L).select("name")
      .collect().head.getString(0) == "nulled")
    // other partitions untouched by that log
    assert(view.where(col("id") === 1L).select("name")
      .collect().head.getString(0) == "a")
  }

  test("unpartitioned directory degrades to a plain read") {
    val dir = s"${Files.createTempDirectory("avroflat")}/t"
    AvroSource.write(Seq((9L, "z")).toDF("id", "name").coalesce(1), dir)
    val df = AvroSource.readPartitioned(spark, dir)
    assert(df.columns.toSeq == Seq("id", "name") && df.count() == 1)
  }

  test("mixed layout (root data files beside k=v dirs) fails loudly") {
    val dir = writeTable()
    // a stray root-level data file has no partition spec — silently
    // dropping it from the scan would be data loss
    AvroSource.write(Seq((9L, "z")).toDF("id", "name").coalesce(1),
      s"$dir/__stray")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/__stray"))
      .find(_.getPath.getName.endsWith(".avro")).get.getPath
    fs.rename(stray, new org.apache.hadoop.fs.Path(s"$dir/stray.avro"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/__stray"), true)
    val e = intercept[IllegalStateException] {
      AvroSource.readPartitioned(spark, dir)
    }
    assert(e.getMessage.contains("mixed partition layout"), e.getMessage)
  }
}
