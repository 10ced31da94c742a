package graft.sink

import org.apache.spark.sql.SparkSession

/** DRIVER-SIDE parquet I/O for driver-sized FLAT metadata artifacts —
  * commit manifests, tombstone sets, applied-batch ledgers. These are
  * a handful of rows that already live on the driver on both sides of
  * the I/O, yet routing them through a Spark write/read paid a full
  * job per touch: task launch, committer temp-dir dance, listener
  * round trips — measured 150-600 ms per tiny artifact on the
  * lifecycle queries, dozens of touches per query. A lakehouse's
  * transaction log is driver-written metadata (Delta's JSON commits,
  * Iceberg's manifest lists) for exactly this reason; this object is
  * that discipline for the engine's own stores, keeping the parquet
  * format so every existing file (and any external reader) stays
  * compatible — the reader consumes Spark-written files and Spark
  * consumes these, bit-equal contents either way.
  *
  * Flat schemas only (int/long/double/string, nullable), which covers
  * every manifest/ledger/tombstone table in the storage layer; nested
  * artifacts (codebooks' array columns, view states) stay on the
  * Spark writer. Files are written through the path's own Hadoop
  * FileSystem (the [[Fs]] scheme-correctness argument), one file per
  * write call with a fresh UUID name — the incarnation-keyed caches
  * remain sound.
  */
object TinyParquet {

  import org.apache.parquet.schema.{MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
  import org.apache.parquet.schema.LogicalTypeAnnotation

  /** Column spec: name -> one of "int" | "long" | "double" | "string"
    * | "binary" | "map<string,long>" (the Spark-compatible MAP group
    * encoding — key_value/key STRING/value INT64 — so files written
    * here and by Spark's own writer stay mutually readable; the bloom
    * manifests' mins/maxs columns). All columns are written optional
    * (Spark reads them nullable, the same as its own writer's default).
    * The read-only type "integral" accepts whichever of INT32/INT64
    * backs the column in the file and yields java.lang.Long — for
    * projecting id/stat columns out of data files whose exact width
    * the reader doesn't care about. */
  type Schema = Seq[(String, String)]

  private def messageType(schema: Schema): MessageType = {
    val b = Types.buildMessage()
    schema.foreach {
      case (n, "int") => b.addField(Types.optional(INT32).named(n))
      case (n, "long") => b.addField(Types.optional(INT64).named(n))
      case (n, "double") => b.addField(Types.optional(DOUBLE).named(n))
      case (n, "string") => b.addField(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named(n))
      case (n, "binary") => b.addField(Types.optional(BINARY).named(n))
      case (n, "map<string,long>") =>
        b.addField(Types.optionalGroup()
          .as(LogicalTypeAnnotation.mapType())
          .addField(Types.repeatedGroup()
            .addField(Types.required(BINARY)
              .as(LogicalTypeAnnotation.stringType()).named("key"))
            .addField(Types.optional(INT64).named("value"))
            .named("key_value"))
          .named(n))
      case (n, "array<double>") =>
        b.addField(Types.optionalGroup()
          .as(LogicalTypeAnnotation.listType())
          .addField(Types.repeatedGroup()
            .addField(Types.optional(DOUBLE).named("element"))
            .named("list"))
          .named(n))
      case (n, t) => throw new IllegalArgumentException(
        s"TinyParquet: unsupported type $t for column $n")
    }
    b.named("spark_schema")
  }

  /** Write `rows` (null cells allowed) as ONE parquet file under the
    * directory `dir` (created if absent; `overwrite = true` clears the
    * directory first — same visible semantics as the Spark writer's
    * overwrite at these call sites). */
  def write(s: SparkSession, dir: String, schema: Schema,
      rows: Seq[Seq[Any]], overwrite: Boolean): Unit = {
    val (fs, d) = {
      val p = new org.apache.hadoop.fs.Path(dir)
      (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
    }
    if (overwrite && fs.exists(d)) fs.delete(d, true): Unit
    fs.mkdirs(d)
    val file = new org.apache.hadoop.fs.Path(d,
      s"part-${java.util.UUID.randomUUID().toString.take(12)}.parquet")
    val mt = messageType(schema)
    val conf = new org.apache.hadoop.conf.Configuration(
      s.sparkContext.hadoopConfiguration)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(mt, conf)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(file, conf))
      .withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try {
      val factory = new org.apache.parquet.example.data.simple
        .SimpleGroupFactory(mt)
      rows.foreach { r =>
        val g = factory.newGroup()
        schema.zip(r).foreach {
          case (_, null) => ()
          case ((n, "int"), v) => g.append(n, v.asInstanceOf[Int])
          case ((n, "long"), v) => g.append(n, v.asInstanceOf[Long])
          case ((n, "double"), v) => g.append(n, v.asInstanceOf[Double])
          case ((n, "string"), v) => g.append(n, v.asInstanceOf[String])
          case ((n, "binary"), v) => g.add(n,
            org.apache.parquet.io.api.Binary
              .fromConstantByteArray(v.asInstanceOf[Array[Byte]]))
          case ((n, "map<string,long>"), v) =>
            val mg = g.addGroup(n)
            // sorted entries: deterministic bytes for identical maps
            v.asInstanceOf[scala.collection.Map[String, Any]].toSeq
              .sortBy(_._1)
              .foreach { case (k, vv) =>
                val kv = mg.addGroup("key_value")
                kv.append("key", k)
                if (vv != null)
                  kv.append("value", vv.asInstanceOf[Long]): Unit
              }
          case ((n, "array<double>"), v) =>
            val ag = g.addGroup(n)
            v.asInstanceOf[Seq[Double]].foreach { d =>
              ag.addGroup("list").append("element", d): Unit
            }
          case ((n, t), _) => throw new IllegalArgumentException(
            s"TinyParquet: unsupported type $t for column $n")
        }
        w.write(g)
      }
    } finally w.close()
  }

  /** Read every `*.parquet` file under `dir` (non-recursive; absent
    * dir = no rows) into driver rows, null for absent optional cells.
    * Columns are resolved BY NAME against `schema`, so files written
    * by the Spark writer (its own column order) and by [[write]] read
    * identically; a file missing a requested column yields nulls for
    * it (the Spark reader's missing-column semantics). */
  def read(s: SparkSession, dir: String, schema: Schema)
      : Seq[Seq[Any]] = {
    val (fs, d) = {
      val p = new org.apache.hadoop.fs.Path(dir)
      (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
    }
    if (!fs.exists(d)) return Nil
    val files = fs.listStatus(d).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet")
        && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
    files.flatMap(st => readFile(s, st.getPath, schema))
  }

  /** Read ONE parquet file into driver rows (same by-name resolution
    * as [[read]]) — for callers that need per-file attribution, e.g.
    * the bloom-manifest mint over a staged file group. */
  def readFile(s: SparkSession, file: org.apache.hadoop.fs.Path,
      schema: Schema): Seq[Seq[Any]] = {
    val conf = new org.apache.hadoop.conf.Configuration(
      s.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        file)
      .withConf(conf)
      .build()
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      var g = r.read()
      while (g != null) {
        val gt = g.getType
        out += schema.map { case (n, t) =>
          val idx = gt.getFields.asScala.indexWhere(_.getName == n)
          if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
          else t match {
            case "int" => g.getInteger(idx, 0)
            case "long" => g.getLong(idx, 0)
            case "double" => g.getDouble(idx, 0)
            case "string" => g.getString(idx, 0)
            case "binary" => g.getBinary(idx, 0).getBytes
            case "integral" =>
              // whichever int width the file carries, widened to Long
              import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
              gt.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
                case PrimitiveTypeName.INT64 =>
                  java.lang.Long.valueOf(g.getLong(idx, 0))
                case PrimitiveTypeName.INT32 =>
                  java.lang.Long.valueOf(g.getInteger(idx, 0).toLong)
                case other => throw new IllegalArgumentException(
                  s"TinyParquet: column $n is $other, not integral")
              }
            case "map<string,long>" =>
              val mg = g.getGroup(idx, 0)
              val nkv = mg.getFieldRepetitionCount("key_value")
              (0 until nkv).map { i =>
                val kv = mg.getGroup("key_value", i)
                val k = kv.getString("key", 0)
                val v: Any =
                  if (kv.getFieldRepetitionCount("value") == 0) null
                  else java.lang.Long.valueOf(kv.getLong("value", 0))
                k -> v
              }.toMap
            case "array<double>" =>
              val ag = g.getGroup(idx, 0)
              val ne = ag.getFieldRepetitionCount("list")
              (0 until ne).map(i =>
                ag.getGroup("list", i).getDouble("element", 0))
            case other => throw new IllegalArgumentException(
              s"TinyParquet: unsupported type $other for column $n")
          }
        }
        g = r.read()
      }
      out.toSeq
    } finally r.close()
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.toSeq
    }
  }
}
