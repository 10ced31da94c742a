package graft

import graft.sink.{CowSnapshots, TinyParquet, Tombstones, TrainingShards}
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 optimization contracts for the driver-side metadata paths:
  * TinyParquet's binary/map columns stay bit-compatible with Spark's
  * own parquet writer/reader (the `_bloom` manifests moved onto them),
  * the known-tiny DRIVER-side bloom mint bit-equals the Spark
  * aggregation it replaced, a re-typing merge feed is rejected loudly
  * (the recorded-schema read's latent type-evolution edge closed), the
  * tombstone append's driver bound is enforced, and resortLayout
  * reproduces a direct sorted write file-by-file (q417's shared rank
  * kernel). */
class MetadataPathSpec extends AnyFunSuite {
  import TestSession._

  test("TinyParquet binary+map columns round-trip through Spark's " +
    "reader and back (the _bloom manifest encoding)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val schema: TinyParquet.Schema = Seq("shard" -> "int",
      "fname" -> "string", "b1" -> "binary",
      "mins" -> "map<string,long>")
    val dir = TempRoots.root("graft_tinypq_spec").resolve("t").toString
    val bs = new java.util.BitSet(); bs.set(3); bs.set(4001)
    val rows: Seq[Seq[Any]] = Seq(
      Seq(1, "f1", bs.toByteArray, Map[String, Any]("a" -> 5L, "b" -> null)),
      Seq(2, "f2", Array.empty[Byte], null),
      Seq(null, "f3", bs.toByteArray, Map[String, Any]()))
    TinyParquet.write(spark, dir, schema, rows, overwrite = true)
    // Spark reads the driver-written file: values and types intact
    val back = spark.read.parquet(dir).orderBy($"fname").collect()
    assert(back.length == 3)
    assert(back(0).getInt(0) == 1 &&
      java.util.BitSet.valueOf(back(0).getAs[Array[Byte]]("b1")) == bs)
    val m0 = back(0).getAs[Map[String, Any]]("mins")
    assert(m0("a") == 5L && m0.contains("b") && m0("b") == null)
    assert(back(1).getAs[Array[Byte]]("b1").isEmpty &&
      back(1).isNullAt(3))
    assert(back(2).isNullAt(0) &&
      back(2).getAs[Map[String, Any]]("mins").isEmpty)
    // and the driver reader consumes a SPARK-written file identically
    val sparkDir = TempRoots.root("graft_tinypq_spec").resolve("s").toString
    Seq((7, "g1")).toDF("shard", "fname")
      .select($"shard", $"fname",
        lit(bs.toByteArray).as("b1"),
        map_from_arrays(array(lit("x")), array(lit(9L))).as("mins"))
      .coalesce(1).write.mode("overwrite").parquet(sparkDir)
    val tiny = TinyParquet.read(spark, sparkDir, schema)
    assert(tiny.length == 1)
    val Seq(sh, fn, b1, mins) = tiny.head
    assert(sh == 7 && fn == "g1")
    assert(java.util.BitSet.valueOf(b1.asInstanceOf[Array[Byte]]) == bs)
    assert(mins.asInstanceOf[scala.collection.Map[String, Any]] ==
      Map("x" -> 9L))
    // array<double> both directions (the codebook artifacts' encoding)
    val arrDir = TempRoots.root("graft_tinypq_spec").resolve("a").toString
    val arrSchema: TinyParquet.Schema =
      Seq("cid" -> "int", "centroid" -> "array<double>")
    TinyParquet.write(spark, arrDir, arrSchema,
      Seq(Seq(0, Seq(1.5, -2.25)), Seq(1, Seq.empty[Double])),
      overwrite = true)
    val viaSpark = spark.read.parquet(arrDir).orderBy($"cid")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(viaSpark.toSeq == Seq((0, Seq(1.5, -2.25)), (1, Seq())))
    val arrDir2 = TempRoots.root("graft_tinypq_spec").resolve("a2").toString
    Seq((3, Seq(0.5, 7.0))).toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(arrDir2)
    val viaTiny = TinyParquet.read(spark, arrDir2, arrSchema)
    assert(viaTiny == Seq(Seq(3, Seq(0.5, 7.0))))
  }

  test("known-tiny driver-side bloom mint bit-equals the Spark " +
    "aggregation over the published group's files") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.catalyst.BitmapAgg.bitmap_agg
    import graft.sink.BloomManifest
    val o = Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey".as("doc_id"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val root = TempRoots.freshForDir("graft_mintspec", sfDir).toString
    val v1 = CowSnapshots.writeVersion(o, root, "doc_id", "seed42", 8)
    val delta = o.orderBy($"doc_id").limit(7)
      .select(lit("upsert").as("op"), $"doc_id",
        ($"cents" + 1L).as("cents"))
    val v2 = CowSnapshots.appendDeltas(spark, root, delta, "doc_id",
      "seed42", 8)
    // the delta group (driver-minted _bloom) = v2's new entries
    val tok = (CowSnapshots.allEntries(spark, root, v2).toSet --
      CowSnapshots.allEntries(spark, root, v1).toSet)
      .map(_._2).head
    val bloomSchema: TinyParquet.Schema = Seq("shard" -> "int",
      "fname" -> "string", "b1" -> "binary", "b2" -> "binary",
      "mins" -> "map<string,long>", "maxs" -> "map<string,long>")
    val minted = TinyParquet
      .read(spark, s"$root/files/$tok/_bloom", bloomSchema)
      .map(r => (r(0), r(1),
        java.util.BitSet.valueOf(r(2).asInstanceOf[Array[Byte]]),
        java.util.BitSet.valueOf(r(3).asInstanceOf[Array[Byte]]),
        r(4), r(5))).toSet
    // the Spark aggregation the driver mint replaced, over the same
    // published bytes (op is a string column — not a stat col)
    val back = spark.read.parquet(s"$root/files/$tok")
    val statCols = Seq("doc_id", "cents")
    val sparkRows = back
      .select(col("doc_id").cast("long").as("k"), col("shard"),
        substring_index(input_file_name(), "/", -1).as("fname"),
        col("doc_id"), col("cents"))
      .groupBy($"shard", $"fname")
      .agg(bitmap_agg(BloomManifest.h1($"k")).as("b1"),
        bitmap_agg(BloomManifest.h2($"k")).as("b2"),
        map_from_arrays(array(statCols.map(lit): _*),
          array(statCols.map(c => min(col(c)).cast("long")): _*))
          .as("mins"),
        map_from_arrays(array(statCols.map(lit): _*),
          array(statCols.map(c => max(col(c)).cast("long")): _*))
          .as("maxs"))
      .collect().map(r => (r.getInt(0), r.getString(1),
        java.util.BitSet.valueOf(r.getAs[Array[Byte]]("b1")),
        java.util.BitSet.valueOf(r.getAs[Array[Byte]]("b2")),
        r.getAs[Map[String, Any]]("mins"),
        r.getAs[Map[String, Any]]("maxs"))).toSet
    assert(minted == sparkRows,
      s"driver mint diverged from the Spark aggregation:\n$minted\nvs\n$sparkRows")
  }

  test("a merge feed that re-types an existing column is rejected " +
    "loudly (recorded-schema reads need type stability)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val o = Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey".as("doc_id"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val root = TempRoots.freshForDir("graft_retype", sfDir).toString
    CowSnapshots.writeVersion(o, root, "doc_id", "seed42", 4)
    val badFeed = o.orderBy($"doc_id").limit(2)
      .select(lit("update").as("op"), $"doc_id",
        $"cents".cast("int").as("cents")) // long -> int re-type
    val e = intercept[IllegalArgumentException] {
      CowSnapshots.mergeVersion(spark, root, badFeed, "doc_id",
        "seed42", 4)
    }
    assert(e.getMessage.contains("re-types existing column"))
    // the additive case (new column, existing types intact) still lands
    val goodFeed = o.orderBy($"doc_id").limit(2)
      .select(lit("update").as("op"), $"doc_id",
        ($"cents" + 1L).as("cents"), lit("s1").as("src"))
    val v2 = CowSnapshots.mergeVersion(spark, root, goodFeed, "doc_id",
      "seed42", 4)
    assert(CowSnapshots.versionSchema(spark, root, v2)
      .fieldNames.contains("src"))
  }

  test("tombstone append enforces its driver bound: one over fails " +
    "loudly, at the bound lands") {
    import spark.implicits._
    val store = TempRoots.root("graft_tombguard").resolve("t").toString
    val e = intercept[IllegalArgumentException] {
      Tombstones.append((1L to 11L).toDF("vec_id"), store, "vec_id",
        maxIds = 10)
    }
    assert(e.getMessage.contains("exceeds 10 ids"))
    Tombstones.append((1L to 10L).toDF("vec_id"), store, "vec_id",
      maxIds = 10)
    assert(Tombstones.read(spark, store, "vec_id").count() == 10L)
  }

  test("ShardExchange.exact puts every shard in its own partition — " +
    "the range layout without the bounds-sampling pass") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.range(0, 1000)
      .select(($"id" % 7).cast("int").as("shard"), $"id")
    val ex = graft.sink.ShardExchange.exact(df, 0 until 7, col("shard"))
      .select($"shard", spark_partition_id().as("p")).distinct()
      .collect()
    assert(ex.length == 7 &&
      ex.forall(r => r.getInt(0) == r.getInt(1)),
      s"each shard must land in ITS OWN partition index: " +
        ex.map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).mkString(","))
    // and an arbitrary sparse domain (compactDeltas routes original
    // shard ids through a size-of-domain exchange)
    val dom = Seq(3, 11, 42)
    val df2 = spark.range(0, 300)
      .select(expr("cast(element_at(array(3,11,42), " +
        "cast(id % 3 as int) + 1) as int)").as("shard"))
    val ex2 = graft.sink.ShardExchange.exact(df2, dom, col("shard"))
      .select($"shard", spark_partition_id().as("p")).distinct()
      .collect()
    assert(ex2.length == 3 &&
      ex2.forall(r => dom.indexOf(r.getInt(0)) == r.getInt(1)))
  }

  test("resortLayout reproduces the direct sorted write file-by-file " +
    "(q417's dual publish shares one rank-kernel run)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val o = Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey".as("doc_id"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
    val root = TempRoots.freshForDir("graft_resort", sfDir).toString
    TrainingShards.write(o, s"$root/ins", "seed42", 4,
      maxRecordsPerFile = 100L)
    TrainingShards.write(o, s"$root/direct", "seed42", 4,
      maxRecordsPerFile = 100L, sortColumns = Seq("v"))
    TrainingShards.resortLayout(spark, s"$root/ins", s"$root/resort",
      4, maxRecordsPerFile = 100L, sortColumns = Seq("v"))
    // per shard: same file count, and the i-th file (name order = roll
    // order) holds the same rows in the same in-file order
    def layout(path: String): Map[Int, Seq[Seq[(Long, Long, Long)]]] = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (0 until 4).map { sh =>
        val dir = new org.apache.hadoop.fs.Path(s"$path/shard_id=$sh")
        val files = fs.listStatus(dir).toSeq.map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet"))
          .sortBy(_.getName)
        sh -> files.map { f =>
          spark.read.parquet(f.toString)
            .select($"doc_id", $"v", $"rk").collect().toSeq
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
      }.toMap
    }
    val (direct, resorted) = (layout(s"$root/direct"),
      layout(s"$root/resort"))
    (0 until 4).foreach { sh =>
      assert(direct(sh).size == resorted(sh).size,
        s"shard $sh file counts differ")
      direct(sh).zip(resorted(sh)).zipWithIndex.foreach {
        case ((d, r), i) =>
          assert(d == r, s"shard $sh file $i contents differ")
      }
    }
  }
}
