package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import scala.jdk.CollectionConverters._

/** Distributed Avro reader built on the shipped `avro-mapred` Hadoop
  * InputFormat (no `spark-avro` connector in this environment). This is
  * the Spark analogue of the reference's native format path
  * (AvroSCDInputFormat.java:51-59 delegates to Hive's Avro container
  * InputFormat): each task deserializes its own splits' container
  * blocks; the driver only touches one file header for schema
  * inference.
  *
  * Reader-schema resolution — the reference's schema-evolution story
  * (AvroSCDInputFormat.java:141-152; README.md:91-97's `extra_field`
  * default) — is delegated to Avro's own `GenericDatumReader` by
  * passing the reader schema through the Hadoop conf
  * (`avro.schema.input.key`), so field defaults/reordering behave
  * byte-for-byte like the reference.
  *
  * Type bridge mirrors SURVEY.md §1.2's SQL_TYPES table
  * (AvroSCDInputFormat.java:156-163): BOOLEAN/INT/LONG/FLOAT/DOUBLE/
  * STRING plus 2-branch NULL unions; BYTES additionally maps to
  * BinaryType (multimodal payload columns). Beyond the reference's
  * map, the standard LOGICAL types are bridged — decimal(p,s) on
  * bytes/fixed ↔ DecimalType, timestamp-millis/micros ↔ TimestampType,
  * date ↔ DateType — covering the reference's own named future work
  * (README.md:251-252). Anything nested still throws, like the
  * reference's UnsupportedOperationException (:178).
  *
  * Scale: schema inference is one driver-side header read; record
  * decoding is per-task, narrow, and immediately converted to Rows
  * inside the same stage (no GenericRecord ever crosses a shuffle).
  */
object AvroSource {

  /** Read a directory (or file) of Avro container files.
    *
    * @param readerSchemaJson optional Avro READER schema; absent → the
    *                         writer schema of the first file found
    * @param columns optional projection: only these fields survive into
    *                the reader schema, so Avro's resolving decoder SKIPS
    *                the rest at the byte level — untouched strings/bytes
    *                are never materialized (the pruning the parquet path
    *                gets from Catalyst, applied to the reference's own
    *                format)
    */
  def read(spark: SparkSession, path: String,
      readerSchemaJson: Option[String] = None,
      columns: Option[Seq[String]] = None): DataFrame = {
    val fullSchema = new Schema.Parser().parse(
      readerSchemaJson.getOrElse(inferWriterSchema(spark, path)))
    val avroSchema = columns.fold(fullSchema)(pruneSchema(fullSchema, _))
    val schemaJson = avroSchema.toString
    val structType = toStructType(avroSchema)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", schemaJson)
    // decode into GenericData.Records; the default ReflectData model
    // would try to resolve a Java CLASS per nested record schema (NPE)
    conf.set("avro.serialization.data.model",
      classOf[org.apache.avro.generic.GenericData].getName)
    val nFields = structType.fields.length
    // per-field converter trees (serializable case objects/classes ride
    // the task closure; the Avro Schema object itself does not)
    val convs = avroSchema.getFields.asScala
      .map(f => convOf(f.schema())).toArray
    val rdd = spark.sparkContext
      .newAPIHadoopFile(path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      // extract values eagerly per record: the InputFormat reuses the
      // AvroKey datum between next() calls
      .map { case (k, _) =>
        val rec = k.datum()
        val vals = new Array[Any](nFields)
        var i = 0
        while (i < nFields) {
          vals(i) = fromAvro(rec.get(i), convs(i))
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    spark.createDataFrame(rdd, structType)
  }

  /** Serializable per-field converter descriptor — the recursive
    * replacement for flat logical-type tags (Avro `Schema` itself is
    * not closure-safe, so the STRUCTURE serializes instead). One tree
    * per top-level field rides the task closure; nested
    * records/arrays/maps recurse. */
  private sealed trait Conv extends Serializable
  private case object Plain extends Conv
  private final case class Dec(scale: Int) extends Conv
  private case object TsMillis extends Conv
  private case object TsMicros extends Conv
  private case object DateDays extends Conv
  private final case class RecConv(fields: Array[Conv]) extends Conv
  private final case class ArrConv(elem: Conv) extends Conv
  private final case class MapConv(value: Conv) extends Conv

  /** The non-NULL branch of a 2-branch NULL union (either order), like
    * the reference's bridge; any other schema passes through. */
  private def nonNullBranch(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size == 1) nonNull.head else s
    case _ => s
  }

  /** Converter tree of a READ-side field schema. */
  private def convOf(s: Schema): Conv = {
    val inner = nonNullBranch(s)
    inner.getLogicalType match {
      case d: org.apache.avro.LogicalTypes.Decimal => Dec(d.getScale)
      case _: org.apache.avro.LogicalTypes.TimestampMillis => TsMillis
      case _: org.apache.avro.LogicalTypes.TimestampMicros => TsMicros
      case _: org.apache.avro.LogicalTypes.Date => DateDays
      case _ => inner.getType match {
        case Schema.Type.RECORD =>
          RecConv(inner.getFields.asScala.map(f => convOf(f.schema())).toArray)
        case Schema.Type.ARRAY => ArrConv(convOf(inner.getElementType))
        case Schema.Type.MAP => MapConv(convOf(inner.getValueType))
        case _ => Plain
      }
    }
  }

  /** Converter tree of a WRITE-side Spark type. */
  private def convOfSpark(dt: DataType): Conv = dt match {
    case d: DecimalType => Dec(d.scale)
    case TimestampType => TsMicros
    case DateType => DateDays
    case st: StructType => RecConv(st.fields.map(f => convOfSpark(f.dataType)))
    case ArrayType(et, _) => ArrConv(convOfSpark(et))
    case MapType(_, vt, _) => MapConv(convOfSpark(vt))
    case _ => Plain
  }

  /** Read a Hive-partitioned Avro table directory with PER-PARTITION
    * reader-schema resolution — the reference's partition-info walk
    * (AvroSCDInputFormat.java:70-99 matches each split's path into
    * `pathToPartitionInfo` so every partition resolves its own Avro
    * properties; `pathIsInPartition` :113-121).
    *
    *   - `readerSchemaFor`: relative partition path ("seg=A", or
    *     "y=1/m=2" for nested partitioning) → that partition's reader
    *     schema JSON;
    *   - unmapped partitions fall back to `defaultReaderJson`, else to
    *     their OWN writer schema — so a table whose partitions were
    *     written under different schema versions unions cleanly with
    *     no explicit schema at all;
    *   - partition columns are attached from the path (as strings,
    *     Hive-unescaped) and the per-partition frames union by name
    *     with missing columns nulled.
    *
    * Plan shape: one narrow scan branch per partition directory (the
    * same per-partition granularity Hive's split planning produces);
    * each branch lists only its own directory. Partition counts are
    * catalog-bounded — for very large P, resolve schemas in groups
    * upstream and call [[read]] per group. */
  def readPartitioned(spark: SparkSession, dir: String,
      readerSchemaFor: Map[String, String] = Map.empty,
      defaultReaderJson: Option[String] = None): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path, spec: Seq[(String, String)])
        : Seq[(Path, Seq[(String, String)])] = {
      val kids = graft.scd.ScdReader.partitionChildren(fs, p)
      if (kids.isEmpty) Seq((p, spec))
      else {
        // a mixed layout (data files beside k=v partition dirs) has no
        // well-defined partition spec for the root files — fail loudly
        // instead of silently dropping them from the scan
        val strays = fs.listStatus(p).toSeq.filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith(".") && !n.startsWith("_")
        }
        if (strays.nonEmpty) throw new IllegalStateException(
          s"mixed partition layout under $p: data files " +
            s"(${strays.map(_.getPath.getName).take(3).mkString(", ")}…) " +
            "sit beside k=v partition directories; move them into a " +
            "partition or read the directory as unpartitioned")
        kids.flatMap { case (child, kv) => leaves(child, spec :+ kv) }
      }
    }
    val parts = leaves(root, Seq.empty)
    val frames = parts.map { case (p, spec) =>
      val rel = spec.map { case (k, v) => s"$k=$v" }.mkString("/")
      val reader = readerSchemaFor.get(rel).orElse(defaultReaderJson)
      spec.foldLeft(read(spark, p.toString, reader)) {
        case (df, (k, v)) =>
          // the Hive default-partition sentinel means a NULL partition
          // value — attach real NULL so downstream guards/filters
          // (e.g. ScdReader.partitionGuard's isNull) see it as such
          val value =
            if (v == "__HIVE_DEFAULT_PARTITION__")
              org.apache.spark.sql.functions.lit(null).cast("string")
            else org.apache.spark.sql.functions.lit(v)
          df.withColumn(k, value)
      }
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Projection pushdown for the reader schema: keep only `columns`
    * (case-insensitive), preserving each kept field's schema,
    * reader-default, sort order, AND aliases (alias-based rename
    * resolution must keep matching the writer's old field names) —
    * schema-evolution still resolves for kept fields, while dropped
    * fields are byte-skipped by the resolving decoder instead of
    * decoded. */
  def pruneSchema(full: Schema, columns: Seq[String]): Schema = {
    require(full.getType == Schema.Type.RECORD,
      s"reader schema must be a record, got ${full.getType}")
    val want = columns.map(_.toLowerCase).toSet
    val all = full.getFields.asScala
    val missing = want -- all.map(_.name.toLowerCase)
    require(missing.isEmpty,
      s"projected columns not in reader schema: ${missing.mkString(", ")}")
    val kept = all.filter(f => want(f.name.toLowerCase)).map { f =>
      val nf = new Schema.Field(f.name, f.schema, f.doc, f.defaultVal,
        f.order)
      f.aliases.asScala.foreach(nf.addAlias)
      nf
    }
    Schema.createRecord(full.getName, full.getDoc, full.getNamespace,
      false, java.util.Arrays.asList(kept.toSeq: _*))
  }

  /** Driver-side writer-schema sniff: first non-hidden `*.avro` (or
    * any) file's container header. */
  def inferWriterSchema(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target =
      if (fs.getFileStatus(p).isDirectory) {
        val files = fs.listStatus(p).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith(".") && !n.startsWith("_")
        }
        require(files.nonEmpty, s"no data files under $path")
        files.map(_.getPath).minBy(_.getName.toString)
      } else p
    val in = fs.open(target)
    try {
      val stream = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try stream.getSchema.toString
      finally stream.close()
    } finally in.close()
  }

  /** Write a DataFrame as an Avro container-file directory via
    * `AvroKeyOutputFormat` — the reverse bridge, so `ScdReader.compact`
    * can round-trip a reference-format (Avro) table dir. Distributed:
    * each task writes its partition's container file. */
  def write(df: DataFrame, path: String,
      recordName: String = "record"): Long = {
    val avroSchema = toAvroSchema(df.schema, recordName)
    val schemaJson = avroSchema.toString
    val conf = new org.apache.hadoop.conf.Configuration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.output.key", schemaJson)
    // we emit GenericData.Records; the default ReflectData model would
    // try to resolve a Java CLASS per nested record schema and NPE
    conf.set("avro.serialization.data.model",
      classOf[org.apache.avro.generic.GenericData].getName)
    val fields = df.schema.fields
    val convs = fields.map(f => convOfSpark(f.dataType))
    // the written-row count rides the save through an accumulator
    // (this is an RDD write — no Observation hook), so callers report
    // what they wrote without a rescan (VERDICT r14 #6). AT-LEAST-ONCE
    // caveat (ADVICE r15): accumulator updates inside a transformation
    // are only exactly-once per successful action — a retried/
    // speculated task can over-COUNT even though the committed DATA is
    // exactly-once (the output committer discards losers). Callers
    // wanting an exact count on a flaky cluster should recount from
    // the committed files; the procedures accept the cheap count
    // because local[..] never retries and the data is unaffected.
    val written = df.sparkSession.sparkContext
      .longAccumulator("graft.avro.rows_written")
    df.rdd.mapPartitions { rows =>
      // schema re-parsed per partition (Schema isn't serializable-safe
      // across all avro versions); records built positionally
      val schema = new Schema.Parser().parse(schemaJson)
      rows.map { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        var i = 0
        while (i < fields.length) {
          rec.put(i, toAvro(row.get(i), convs(i),
            schema.getFields.get(i).schema()))
          i += 1
        }
        written.add(1L)
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[org.apache.avro.mapreduce.AvroKeyOutputFormat[GenericRecord]],
      conf)
    written.value
  }

  /** Spark StructType → Avro record schema (reverse of the §1.2 map;
    * nullable fields become [null, T] unions). Logical types — the
    * reference's own named gap (README.md:251-252 lists decimal as
    * future work): DecimalType → bytes+decimal(p,s); TimestampType →
    * long+timestamp-micros (Spark timestamps carry µs — writing millis
    * would silently truncate; the READ side accepts both millis and
    * micros); DateType → int+date. */
  def toAvroSchema(st: StructType, recordName: String): Schema = {
    val fields = st.fields.map { f =>
      val base = typeToAvro(f.dataType, s"${recordName}_${f.name}")
      val sch = wrapNullable(base, f.nullable)
      new Schema.Field(f.name, sch, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft.avro", false,
      java.util.Arrays.asList(fields: _*))
  }

  private def wrapNullable(s: Schema, nullable: Boolean): Schema =
    if (nullable)
      Schema.createUnion(java.util.Arrays.asList(
        Schema.create(Schema.Type.NULL), s))
    else s

  /** One Spark type → Avro schema node; nested records get
    * `name`-derived unique record names (Avro requires them). */
  private def typeToAvro(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case st: StructType => toAvroSchema(st, name)
    case ArrayType(et, containsNull) =>
      Schema.createArray(wrapNullable(
        typeToAvro(et, s"${name}_item"), containsNull))
    case MapType(StringType, vt, valueContainsNull) =>
      Schema.createMap(wrapNullable(
        typeToAvro(vt, s"${name}_value"), valueContainsNull))
    case MapType(kt, _, _) => throw new UnsupportedOperationException(
      s"Avro maps require string keys, got $kt")
    case other => throw new UnsupportedOperationException(
      s"unsupported Spark type for Avro write: $other")
  }

  /** Spark external row value → Avro runtime value. `s` is the field's
    * schema node (nullability union looked through), needed to
    * construct nested GenericRecords/arrays/maps. */
  private def toAvro(v: Any, c: Conv, s: Schema): Any =
    if (v == null) null
    else c match {
      case Dec(scale) =>
        // unscaled two's-complement bytes at the DECLARED scale (the
        // Avro decimal contract: scale lives in the schema, not the
        // payload); setScale is exact here — the value was written into
        // a DecimalType(p, s) column, so it already fits scale s
        java.nio.ByteBuffer.wrap(v.asInstanceOf[java.math.BigDecimal]
          .setScale(scale).unscaledValue().toByteArray)
      case TsMicros =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
      case TsMillis => v.asInstanceOf[java.sql.Timestamp].getTime
      case DateDays =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case RecConv(fs) =>
        val rs = nonNullBranch(s)
        val row = v.asInstanceOf[Row]
        val rec = new org.apache.avro.generic.GenericData.Record(rs)
        var i = 0
        while (i < fs.length) {
          rec.put(i, toAvro(row.get(i), fs(i), rs.getFields.get(i).schema()))
          i += 1
        }
        rec
      case ArrConv(e) =>
        val as = nonNullBranch(s)
        val out = new java.util.ArrayList[Any]()
        v.asInstanceOf[scala.collection.Seq[Any]]
          .foreach(x => out.add(toAvro(x, e, as.getElementType)))
        out
      case MapConv(vc) =>
        val ms = nonNullBranch(s)
        val out = new java.util.HashMap[String, Any]()
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .foreach { case (k, x) =>
            out.put(k, toAvro(x, vc, ms.getValueType))
          }
        out
      case Plain => v match {
        case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
        case other => other // String/Int/Long/Float/Double/Boolean as-is
      }
    }

  /** Avro schema → Spark StructType (SURVEY.md §1.2 map). */
  def toStructType(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${s.getType}")
    StructType(s.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    // logical types first — decimal rides bytes/fixed, timestamps ride
    // long, date rides int (the reference's named future work,
    // README.md:251-252; SURVEY §1.2 sanctions supporting them here)
    case Schema.Type.BYTES | Schema.Type.FIXED
        if s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Decimal] =>
      val d = s.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
      (DecimalType(d.getPrecision, d.getScale), false)
    case Schema.Type.LONG
        if s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.TimestampMillis] ||
          s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.TimestampMicros] =>
      (TimestampType, false)
    case Schema.Type.INT
        if s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Date] =>
      (DateType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.UNION =>
      // exactly-2-branch NULL unions, either order, like the reference
      // (AvroSCDInputFormat.java:169-177)
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (branches.size == 2 && nonNull.size == 1)
        (toSparkType(nonNull.head)._1, true)
      else throw new UnsupportedOperationException(
        s"unsupported Avro union: $s")
    // nested containers — BEYOND the reference's flat-record boundary
    // (README.md:248-252 names nesting as its own future work; SURVEY
    // §1.2 sanctions supporting it in Spark). DML stays flat: SET on a
    // nested path doesn't resolve, nested columns pass through replay
    // untouched — the same contract the reference would have.
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.map { f =>
        val (dt, nullable) = toSparkType(f.schema())
        StructField(f.name(), dt, nullable)
      }.toArray), false)
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toSparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.ENUM => (StringType, false) // read-only: symbol name
    case other => throw new UnsupportedOperationException(
      s"unsupported Avro type: $other")
  }

  /** Avro runtime value → Spark external row value, logical types
    * decoded per the field's tag (GenericDatumReader hands back the
    * RAW carrier — ByteBuffer/Fixed/Long/Int — no conversions
    * registered). */
  private def fromAvro(v: Any, c: Conv): Any =
    if (v == null) null
    else c match {
      case Dec(scale) =>
        val bytes = v match {
          case b: java.nio.ByteBuffer =>
            val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
          case other => throw new UnsupportedOperationException(
            s"decimal carrier must be bytes/fixed, got ${other.getClass}")
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
      case TsMillis => new java.sql.Timestamp(v.asInstanceOf[Long])
      case TsMicros =>
        val us = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case DateDays => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case RecConv(fs) =>
        val rec = v.asInstanceOf[GenericRecord]
        val vals = new Array[Any](fs.length)
        var i = 0
        while (i < fs.length) {
          vals(i) = fromAvro(rec.get(i), fs(i))
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      case ArrConv(e) =>
        v.asInstanceOf[java.util.Collection[Any]].asScala
          .map(fromAvro(_, e)).toSeq
      case MapConv(vc) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> fromAvro(mv, vc)
        }.toMap
      case Plain => fromAvro(v)
    }

  /** Avro runtime value → Spark external row value (plain types). */
  private def fromAvro(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence => s.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case other => other // Int/Long/Float/Double/Boolean box as-is
  }
}
