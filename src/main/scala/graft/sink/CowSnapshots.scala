package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COPY-ON-WRITE versioned snapshots — the file-granular economics the
  * full-rewrite store ([[TrainingShards.writeVersion]]) honestly
  * concedes it lacks: there, every published version rewrites the
  * ENTIRE corpus, so a daily CDC merge on a 100 TB corpus costs 100 TB
  * of write amplification per merge and O(versions x corpus) storage
  * until expiry. Here a version's manifest lists FILE GROUPS, and a
  * merge rewrites only the shard groups the delta's keys route to —
  * version N+1's manifest re-lists the untouched majority of version
  * N's physical files (exactly how Delta/Iceberg manifests work, in
  * this store's own one-winner-claim idiom). Merge cost scales with
  * |delta|, storage with |history of changes|, never with the corpus.
  *
  * Layout under `root`:
  *   - `files/<tok>/shard=K/ * .parquet` — immutable file groups, one
  *     `tok` per publish operation; rows inside a shard are ordered by
  *     key, so capped files are range-disjoint.
  *   - `files/<tok>/_bloom/` — the group's per-file bloom manifest
  *     (shard, file name, two 4093-bit bitmaps — [[BloomManifest]]'s
  *     mixers), MINTED WITH THE GROUP: point-lookup metadata exists
  *     the instant the data does, never rebuilt (q439's lesson applied
  *     from birth).
  *   - `manifest/c_N/` — version N's commit, one one-winner rename
  *     claim ([[Fs.claim]]): one row PER SHARD = (version, shard, dir,
  *     n_rows, batch_id). Readers resolve versions from the manifest
  *     alone; a crash before the commit claim leaves invisible file
  *     groups that the age-gated vacuum collects.
  *
  * Unlike the rank-based round-robin kernel (which reshuffles every
  * row's shard when the corpus changes), shard routing here is
  * KEY-STABLE: `shard = pmod(xxhash64(seed, key), nShards)` — the
  * property copy-on-write requires, since an untouched key must keep
  * hashing into an untouched file group. Routing is content-derived
  * and deterministic across cluster layouts, like every kernel in
  * this engine.
  *
  * Expiry is REF-COUNTED file GC: retiring a version deletes its
  * manifest rows first (readers stay sound at every intermediate
  * state), then deletes exactly the file groups no surviving version
  * references — a group shared with a survivor lives on, which is the
  * whole point. Commit-vs-vacuum serializes through the same manifest
  * lease as the full-rewrite store. */
object CowSnapshots {

  private def manifestDir(root: String) = s"$root/manifest"
  private def filesDir(root: String) = s"$root/files"
  private def lease(root: String) = s"${manifestDir(root)}/_lease"

  /** The key-stable routing kernel (exposed for specs and the
    * time-travel point lookup, which routes each probe to its one
    * shard before touching any bloom row). */
  def shardOf(seed: String, key: Column, nShards: Int): Column =
    pmod(xxhash64(lit(seed), key), lit(nShards.toLong)).cast("int")

  /** Driver-side twin of [[shardOf]] — pure JVM arithmetic, NO Spark
    * job per probe (the column-form twin launched a single-row job
    * per lookup, a full job-submission latency on every interactive
    * point probe). Reproduces `xxhash64(lit(seed), key)` exactly:
    * Spark's XxHash64 folds its children left-to-right starting from
    * seed 42 — the string's UTF-8 bytes first, then the long — and
    * the property spec pins bit-equality against the column form
    * across the key domain (negatives included), so a drift between
    * the two routings cannot land silently. */
  def shardOfKey(seed: String, key: Long, nShards: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(seed)
    val h0 = XXH64.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    val h = XXH64.hashLong(key, h0)
    val n = nShards.toLong
    (((h % n) + n) % n).toInt
  }

  private def commitSlots(s: SparkSession, root: String): Seq[String] =
    Fs.listDirNames(s, manifestDir(root)).filter(_.startsWith("c_"))

  /** The manifest row's flat schema — written and read DRIVER-SIDE
    * ([[TinyParquet]]): manifest rows are driver-sized on both ends
    * (shards x chain length), and the Spark-job round trip per
    * commit/meta-read was pure per-publish overhead (the Delta-log
    * discipline: transaction metadata is driver I/O, never a cluster
    * job). */
  private val manifestRowSchema: TinyParquet.Schema = Seq(
    "version" -> "int", "shard" -> "int", "dir" -> "string",
    "n_rows" -> "long", "seq" -> "int", "schema_ddl" -> "string",
    "key_col" -> "string", "seed" -> "string", "n_shards" -> "int",
    "batch_id" -> "string")

  /** Committed versions from the SLOT LISTING alone — the slot name
    * IS the version (claimed as `c_N`), so resolution is one
    * metadata listing, zero Spark jobs, and always fresh. */
  def committedVersions(s: SparkSession, root: String): Seq[Int] =
    commitSlots(s, root).map(_.stripPrefix("c_").toInt).sorted

  /** batch_id -> version over the committed slots; per-version rows
    * come from the immutable-manifest cache, so a replay lookup costs
    * one listing plus at most one read per NEVER-SEEN version. */
  def committedBatchVersions(s: SparkSession, root: String)
      : Map[String, Int] =
    committedVersions(s, root)
      .flatMap(v => meta(s, root, v).batchId.map(_ -> v)).toMap

  /** One committed manifest, fully materialized. A c_N slot is
    * IMMUTABLE once its one-winner claim lands (retirement deletes it
    * wholesale, never edits it), so per-(root, version) caching is
    * sound and collapses the storage verbs' metadata traffic — a
    * lifecycle like q446's otherwise pays a separate tiny Spark job
    * for every entries/schema/key-column lookup, dozens per query. A
    * retired version stays gated by [[committedVersions]] (never
    * cached — freshness is its contract), so a stale cache row is
    * unreachable, not wrong. */
  private final case class Meta(rows: Seq[(Int, String, Long, Int)],
      schemaDdl: String, keyCol: String, seed: String, nShards: Int,
      batchId: Option[String])

  /** Keyed by (root, version, SLOT INCARNATION): a slot number can be
    * reused across store incarnations — this driver's own
    * wipe-and-rebuild (handled by the remove() on claim/retire) but
    * also ANOTHER driver's, which this JVM never observes. The
    * incarnation id is the slot's sorted child-file listing: every
    * manifest write mints part files with fresh UUID names, so two
    * incarnations of c_N can never alias — unlike an mtime key, which
    * collapses on filesystems with coarse (e.g. 1 s) timestamp
    * granularity when the wipe-and-rebuild lands inside one tick. One
    * metadata listing per lookup, no Spark job. Rows whose incarnation
    * was superseded are evicted on the next lookup of the same (root,
    * version), so the cache never accumulates dead incarnations. */
  private val metaCache = new java.util.concurrent
    .ConcurrentHashMap[(String, Int, String), Meta]()

  private def meta(s: SparkSession, root: String, v: Int): Meta = {
    val inc = Fs.listNames(s, s"${manifestDir(root)}/c_$v")
      .filter(_.endsWith(".parquet")).mkString(",")
    metaCache.keySet.removeIf(k =>
      k._1 == root && k._2 == v && k._3 != inc)
    metaCache.computeIfAbsent((root, v, inc), _ => {
      val rows = TinyParquet.read(s, s"${manifestDir(root)}/c_$v",
        manifestRowSchema)
      val h = rows.head
      Meta(rows.map(r => (r(1).asInstanceOf[Int],
          r(2).asInstanceOf[String], r(3).asInstanceOf[Long],
          r(4).asInstanceOf[Int]))
        .sortBy(e => (e._1, e._4)),
        h(5).asInstanceOf[String], h(6).asInstanceOf[String],
        h(7).asInstanceOf[String], h(8).asInstanceOf[Int],
        Option(h(9).asInstanceOf[String]))
    })
  }

  private def dropCached(root: String, v: Int): Unit =
    metaCache.keySet.removeIf(k => k._1 == root && k._2 == v): Unit

  /** Version `v`'s manifest entries: (shard, dir, n_rows), sorted by
    * shard. Empty shards have no entry. A flat (copy-on-write-only)
    * version has one entry per shard; a version with merge-on-read
    * deltas ([[appendDeltas]]) lists a shard's base AND delta groups —
    * use [[allEntries]] when the apply order matters. */
  def entries(s: SparkSession, root: String, v: Int)
      : Seq[(Int, String, Long)] =
    meta(s, root, v).rows.map(e => (e._1, e._2, e._3))

  /** [[entries]] with the merge-on-read sequence number: (shard, dir,
    * n_rows, seq). seq 0 is the shard's base group; seq 1..k are its
    * delta groups in APPLY ORDER (latest wins per key at read time). */
  def allEntries(s: SparkSession, root: String, v: Int)
      : Seq[(Int, String, Long, Int)] = meta(s, root, v).rows

  /** The key column recorded at commit (resolution needs it). */
  def versionKeyCol(s: SparkSession, root: String, v: Int): String =
    meta(s, root, v).keyCol

  /** The routing (seed, nShards) recorded at commit — table
    * properties, the Delta-log discipline: maintenance verbs like
    * [[compactDeltas]] reproduce the original shard routing from the
    * manifest instead of trusting a caller to repeat it. */
  def versionRouting(s: SparkSession, root: String, v: Int)
      : (String, Int) = {
    val m = meta(s, root, v)
    (m.seed, m.nShards)
  }

  /** Version `v`'s RECORDED schema — carried in the commit rows (the
    * Delta-log discipline: the manifest, not footer inference, is the
    * source of truth), so resolving a version's shape is a metadata
    * read regardless of file count, and a column that only exists in
    * some shared groups can never be resurrected into a version whose
    * feed dropped... never arises: merges REQUIRE additive feeds (see
    * [[mergeVersion]]), so the recorded schema only ever grows. */
  def versionSchema(s: SparkSession, root: String, v: Int)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      meta(s, root, v).schemaDdl)

  /** Build one immutable file group from a frame that already carries
    * a `shard` column; returns (tok, per-shard row counts). The
    * group's file-level metadata is minted from the staged bytes
    * BEFORE the group becomes visible — file names (not full paths)
    * are stored, so the post-move paths resolve. One `_bloom` row per
    * physical file carries BOTH skipping families in one aggregate
    * and one write: the two bloom bitmaps (point lookups) and
    * per-integral-column min/max ZONE MAPS (range predicates — the
    * Delta/Iceberg discipline of min/max IN the manifest, so range
    * planning never opens a single data-file footer).
    *
    * `sortColumns` is the sort-on-write knob (q417's, applied to the
    * copy-on-write layout): rows inside each shard are ordered by
    * those columns (key appended as tie-break) instead of by key, so
    * with `maxRecordsPerFile` capping, each split file covers a
    * NARROW value range of the sort column and the zone maps prune a
    * band probe to the 1-2 files per shard that hold it. */
  private def buildGroup(df: DataFrame, root: String, keyCol: String,
      nShards: Int, maxRecordsPerFile: Long,
      candShards: Seq[Int], sortColumns: Seq[String] = Nil,
      // known (or manifest-bounded) input row count: small values gate
      // the DRIVER-SIDE bloom mint (zero Spark jobs for the mint)
      knownRows: Option[Long] = None)
      : (String, Map[Int, Long]) = {
    val s = df.sparkSession
    import s.implicits._
    val tok = java.util.UUID.randomUUID().toString.take(12)
    val staged = s"$root/_staging/$tok"
    val order = (col("shard") +: sortColumns.map(col)) :+ col(keyCol)
    // per-shard counts ride the WRITE job as an Observation (one sum
    // per candidate shard id — the caller knows the routing domain)
    // instead of a separate count job re-reading the staged bytes:
    // same counts, one job and one whole-group scan fewer per publish
    // (guide §1.2 — every version mint pays this). The observe sits
    // ABOVE the exchange, where it has always been: under the old
    // range partitioning a metrics node below the exchange was also
    // evaluated by the bounds-sampling pass and double-counted
    // (measured: exactly-2x); the exact exchange has no sampling
    // pass, but the position costs nothing and stays safe against
    // any future re-introduction of range partitioning. The in-file
    // sort applies after the pass-through metrics node — layout
    // unchanged.
    val obs = new org.apache.spark.sql.Observation(
      "group_audit_" + tok)
    val audits = candShards.map(k =>
      sum(when($"shard" === k, 1L).otherwise(0L)).as(s"n_$k"))
    // ONE write shape for every group build: the exact
    // one-task-per-shard exchange ([[ShardExchange]]) — the layout
    // range partitioning gave, minus the bounds-SAMPLING pass that
    // evaluated the whole child plan a SECOND time (the entire
    // touched-shard read + anti-join, for a merge). This replaced two
    // earlier shapes: repartitionByRange (the sampling double-eval)
    // and a known-tiny coalesce(1) path (which existed only to dodge
    // that sampling, and SERIALIZED parquet file creation — a capped
    // 56k-row merge writing ~112 files in one task measured slower
    // than the parallel exchange). Empty candidate shards cost one
    // empty task and write nothing.
    val arranged = ShardExchange.exact(df, candShards, $"shard")
    arranged
      .observe(obs, audits.head, audits.tail: _*)
      .sortWithinPartitions(order: _*)
      .write.partitionBy("shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(staged)
    val metrics = obs.get
    val counts: Map[Int, Long] = candShards.flatMap { k =>
      metrics.get(s"n_$k") match {
        case Some(n: Long) if n > 0L => Some(k -> n)
        case _ => None
      }
    }.toMap
    // ---- bloom/zone-map mint over the staged bytes ---------------------
    // The per-(file) rows are driver-sized metadata (one row per
    // physical file), so the WRITE is always driver-side TinyParquet
    // (same Spark-readable bytes, no committer job per publish). The
    // AGGREGATION stays a Spark job for big groups — it scans every row
    // — but a KNOWN-TINY group (the delta-append path, which already
    // counted its rows) is read back driver-side instead: zero Spark
    // jobs for the whole mint (guide §1.2 — every delta publish paid a
    // read-back scan job + a coalesce(1) write job here). Integral-typed
    // key/stat columns only on the driver path (the contract of these
    // stores); anything else falls back to the Spark aggregation.
    val statCols = df.schema.fields.filter { f =>
      f.name != "shard" && integralType(f.dataType)
    }.map(_.name).toIndexedSeq
    val keyIntegral = df.schema.fields
      .find(_.name == keyCol).exists(f => integralType(f.dataType))
    // the driver fold wins only at TRUE delta sizes: the example-API
    // row reader is serial and object-per-row (measured ~3.5 s on a
    // 56k-row capped merge vs ~0.3 s for the parallel Spark
    // aggregation) — gate it to a few thousand rows, where it costs
    // milliseconds and removes the mint's scan job outright
    val bloomRows: Seq[Seq[Any]] =
      if (knownRows.exists(_ <= 5000L) && keyIntegral)
        mintRowsDriverSide(s, staged, keyCol, statCols)
      else
        mintRowsSpark(s, staged, keyCol, statCols)
    TinyParquet.write(s, s"$staged/_bloom", bloomRowSchema, bloomRows,
      overwrite = true)
    Fs.move(s, staged, s"${filesDir(root)}/$tok")
    (tok, counts)
  }

  private def integralType(t: org.apache.spark.sql.types.DataType)
      : Boolean = t == org.apache.spark.sql.types.LongType ||
    t == org.apache.spark.sql.types.IntegerType ||
    t == org.apache.spark.sql.types.ShortType ||
    t == org.apache.spark.sql.types.ByteType

  /** The `_bloom` manifest row: one per physical file — bloom bitmaps
    * for point skipping, per-integral-column min/max zone maps for
    * range skipping. Written driver-side ([[TinyParquet]], the map
    * columns in Spark's own MAP encoding) and read driver-side by
    * every consumer; bytes stay bit-compatible with the old Spark
    * coalesce(1) writer's. */
  private val bloomRowSchema: TinyParquet.Schema = Seq(
    "shard" -> "int", "fname" -> "string", "b1" -> "binary",
    "b2" -> "binary", "mins" -> "map<string,long>",
    "maxs" -> "map<string,long>")

  /** Mint rows via one Spark aggregation over the staged group (the
    * general, corpus-scale path), collected — rows are file-count-
    * bounded. */
  private def mintRowsSpark(s: SparkSession, staged: String,
      keyCol: String, statCols: IndexedSeq[String]): Seq[Seq[Any]] = {
    import s.implicits._
    import graft.catalyst.BitmapAgg.bitmap_agg
    val back = s.read.parquet(staged)
    val statAggs =
      if (statCols.isEmpty) Seq(
        lit(null).cast("map<string,bigint>").as("mins"),
        lit(null).cast("map<string,bigint>").as("maxs"))
      else Seq(
        map_from_arrays(
          array(statCols.map(lit): _*),
          array(statCols.map(c => min(col(c)).cast("long")): _*))
          .as("mins"),
        map_from_arrays(
          array(statCols.map(lit): _*),
          array(statCols.map(c => max(col(c)).cast("long")): _*))
          .as("maxs"))
    back.select((col(keyCol).cast("long").as("k") +: col("shard") +:
        substring_index(input_file_name(), "/", -1).as("fname") +:
        statCols.map(col)): _*)
      .groupBy($"shard", $"fname")
      .agg(bitmap_agg(BloomManifest.h1($"k")).as("b1"),
        (bitmap_agg(BloomManifest.h2($"k")).as("b2") +: statAggs): _*)
      .collect().toSeq.map { r =>
        Seq(r.getInt(0), r.getString(1), r.getAs[Array[Byte]]("b1"),
          r.getAs[Array[Byte]]("b2"),
          r.getAs[scala.collection.Map[String, Any]]("mins"),
          r.getAs[scala.collection.Map[String, Any]]("maxs"))
      }
  }

  /** Mint rows DRIVER-SIDE for a known-tiny staged group: read each
    * staged file's key + integral stat columns through the driver
    * parquet reader and fold the same bitmaps/min/max the Spark
    * aggregation computes — BitSet.toByteArray is canonical, so the
    * bytes bit-equal the aggregate's for the same key set (CowSpec
    * pins the equivalence). Zero Spark jobs. */
  private def mintRowsDriverSide(s: SparkSession, staged: String,
      keyCol: String, statCols: IndexedSeq[String]): Seq[Seq[Any]] = {
    import graft.catalyst.BitmapAgg
    val cols = (keyCol +: statCols.filterNot(_ == keyCol)).toIndexedSeq
    val statIdx = statCols.map(cols.indexOf).toArray
    Fs.listDirNames(s, staged).filter(_.startsWith("shard="))
      .sortBy(_.stripPrefix("shard=").toInt).flatMap { shd =>
        val sh = shd.stripPrefix("shard=").toInt
        Fs.listNames(s, s"$staged/$shd")
          .filter(f => f.endsWith(".parquet") && !f.startsWith("_") &&
            !f.startsWith(".")).sorted.map { fname =>
            val recs = TinyParquet.readFile(s,
              new org.apache.hadoop.fs.Path(s"$staged/$shd/$fname"),
              cols.map(_ -> "integral"))
            val b1 = new java.util.BitSet()
            val b2 = new java.util.BitSet()
            val mins = Array.fill[java.lang.Long](statCols.size)(null)
            val maxs = Array.fill[java.lang.Long](statCols.size)(null)
            recs.foreach { r =>
              val k = r(0).asInstanceOf[java.lang.Long]
              if (k != null) {
                // same loud dense-domain guard as bitmap_agg's
                b1.set(BitmapAgg.requireDense(
                  BloomManifest.h1Long(k).toLong))
                b2.set(BitmapAgg.requireDense(
                  BloomManifest.h2Long(k).toLong))
              }
              var i = 0
              while (i < statCols.size) {
                val v = r(statIdx(i)).asInstanceOf[java.lang.Long]
                if (v != null) {
                  if (mins(i) == null || v < mins(i)) mins(i) = v
                  if (maxs(i) == null || v > maxs(i)) maxs(i) = v
                }
                i += 1
              }
            }
            def toMap(a: Array[java.lang.Long]): Any =
              if (statCols.isEmpty) null
              else statCols.zip(a).toMap: scala.collection.Map[String, Any]
            Seq(sh, fname, b1.toByteArray, b2.toByteArray,
              toMap(mins), toMap(maxs))
          }
      }
  }

  /** Claim the next version slot for `rows` (one manifest row per
    * shard, all carrying the version's recorded schema). The whole
    * commit — latest-version resolution, parent validation, staged
    * manifest write, group-existence probes, claim — runs under ONE
    * hold of the manifest lease, the same arbiter the GC's deletes
    * take:
    *
    *   - every referenced file group must still exist (`_SUCCESS`-
    *     probed, so a directory some other writer merely re-created
    *     cannot satisfy it) — a merge that planned against a version
    *     the GC retired mid-flight aborts LOUDLY instead of
    *     committing a version with missing files;
    *   - when `expectedParent` is set (every DERIVED publish: merge,
    *     delta append, compaction), the latest committed version must
    *     still BE that parent — a concurrent commit that advanced the
    *     store means this publish was derived from stale state, and
    *     blindly taking the next slot would silently revert the
    *     intervening version's changes (the lost update Delta/Iceberg
    *     abort on). The caller re-derives against the new latest and
    *     retries; only parent-independent full publishes
    *     ([[writeVersion]]) keep the blind slot-bump.
    *
    * The manifest rows are a handful of KBs, so staging them inside
    * the lease costs microseconds of extra hold time and buys the
    * check-then-claim atomicity. Returns the committed version. */
  private def commitRows(s: SparkSession, root: String,
      rows: Seq[(Int, String, Long, Int)], schemaDdl: String,
      keyCol: String, seed: String, nShards: Int,
      batchId: Option[String], expectedParent: Option[Int] = None): Int = {
    import s.implicits._
    require(rows.nonEmpty,
      s"refusing to commit an EMPTY manifest under $root — a zero-row " +
        "publish would mint a version no reader can resolve metadata " +
        "for; publish at least one row")
    val ctokBase = s"$root/_staging/c_" +
      java.util.UUID.randomUUID().toString.take(12)
    val v = Fs.withLease(s, lease(root)) {
      val latest = committedVersions(s, root).lastOption.getOrElse(0)
      expectedParent.foreach { p =>
        require(latest == p,
          s"store advanced to v$latest while this publish was derived " +
            s"against v$p — committing would silently revert " +
            s"v${p + 1}..v$latest (lost update); re-derive against " +
            "the new latest and retry")
      }
      rows.map(_._2).distinct.foreach { d =>
        require(Fs.exists(s, s"${filesDir(root)}/$d/_SUCCESS"),
          s"file group $d vanished before commit (expired " +
            "mid-merge?) — aborting; retry against the new latest")
      }
      var vTry = latest + 1
      var attempts = 0
      var done = false
      while (!done) {
        TinyParquet.write(s, ctokBase, manifestRowSchema,
          rows.map { case (sh, dir, n, seq) =>
            Seq(vTry, sh, dir, n, seq, schemaDdl, keyCol, seed,
              nShards, batchId.orNull) },
          overwrite = true)
        done = Fs.claim(s, ctokBase, s"${manifestDir(root)}/c_$vTry")
        if (!done) { vTry += 1; attempts += 1 }
        require(attempts < 10000,
          s"could not claim a version under $root")
      }
      vTry
    }
    // a slot number can be REUSED across store incarnations (a test
    // harness clearing and rebuilding the same root, or expire
    // followed by fresh commits) — a landed claim is the one event
    // that makes any previously-cached (root, v) stale in THIS driver
    // (another driver's reuse is covered by the incarnation cache key).
    // The just-committed manifest is fully in hand, so pre-populate the
    // cache with it: the next entries/schema/key lookup over this
    // version costs a listing and zero Spark jobs.
    dropCached(root, v)
    metaCache.put((root, v,
        Fs.listNames(s, s"${manifestDir(root)}/c_$v")
          .filter(_.endsWith(".parquet")).mkString(",")),
      Meta(rows.map(r => (r._1, r._2, r._3, r._4))
          .sortBy(e => (e._1, e._4)),
        schemaDdl, keyCol, seed, nShards, batchId))
    v
  }

  /** Publish `docs` as the next full version (every shard written).
    * `batchId` gives exactly-once replay: a committed id resolves to
    * its version as a pure no-op (the referenced file groups are
    * immutable — nothing to heal, nothing to rewrite). */
  def writeVersion(docs: DataFrame, root: String, keyCol: String,
      seed: String, nShards: Int, maxRecordsPerFile: Long = 0L,
      batchId: Option[String] = None,
      sortColumns: Seq[String] = Nil): Int = {
    val s = docs.sparkSession
    batchId.flatMap(id => committedBatchVersions(s, root).get(id)) match {
      case Some(v) => v
      case None =>
        val df = docs.withColumn("shard",
          shardOf(seed, col(keyCol), nShards))
        val (tok, counts) =
          buildGroup(df, root, keyCol, nShards, maxRecordsPerFile,
            0 until nShards, sortColumns)
        commitRows(s, root,
          counts.toSeq.sorted.map { case (sh, n) => (sh, tok, n, 0) },
          docs.schema.toDDL, keyCol, seed, nShards, batchId)
    }
  }

  /** Read a committed snapshot (latest when `version` is None): the
    * manifest's file groups, conformed to the version's RECORDED
    * schema — which is how COPY-ON-WRITE schema evolution falls out
    * almost for free: a merge that adds a column writes it only into
    * the groups it rewrites, older shared groups null-fill it at read
    * time (mergeSchema union + the conform projection), and a version
    * PINNED before the evolution records only pre-evolution fields, so
    * its schema stays its own forever — no rewrite, no read-side view,
    * the manifest is the schema boundary (q444 grades both sides; type
    * changes need explicit casts in the change feed, the standard
    * parquet constraint). Conforming to the RECORDED fields — not the
    * raw footer union — also means a column present only in shared
    * older groups can never leak into a version whose schema does not
    * declare it. */
  def readVersion(s: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val committed = committedVersions(s, root)
    require(committed.nonEmpty, s"no committed snapshots under $root")
    val v = version.getOrElse(committed.last)
    require(committed.contains(v),
      s"version $v is not committed (manifest has ${committed.mkString(",")})")
    val es = allEntries(s, root, v)
    require(es.nonEmpty, s"version $v has no file groups")
    readEntries(s, root, v, es)
  }

  /** Read a version RESTRICTED to the given manifest entries, conformed
    * to the version's recorded schema, with MERGE-ON-READ resolution
    * where a shard carries delta groups: the shared read kernel under
    * [[readVersion]] (all entries), [[diffVersions]] (changed shards),
    * and [[mergeVersion]]/[[compactDeltas]] (touched shards).
    *
    * Resolution: flat shards (base group only) stream straight off
    * their files — zero overhead, the common case. For delta-bearing
    * shards the winner per key is each key's HIGHEST-seq row (dropped
    * when that row is a delete), and the plan exploits that a BASE
    * row can only win when NO delta touches its key: the delta
    * chains' op-tagged rows resolve latest-wins among THEMSELVES (a
    * window over O(|delta|) rows), and the base side anti-joins the
    * deltas' distinct-key set — size-gated broadcast, the store's
    * standard discipline — so the shuffle scales with |delta|, not
    * with the touched shards' full base size (a 6-row delta on a hot
    * shard no longer re-shuffles the shard's whole base at read
    * time). This is merge-on-read's documented trade, with the
    * read-side rent now O(|delta| + base scan), until
    * [[compactDeltas]] folds the chain. [[appendDeltas]] enforces
    * one op per key per batch, so within a chain the seq ordering is
    * total per key — no nondeterministic intra-batch tie. */
  private def readEntries(s: SparkSession, root: String, v: Int,
      es: Seq[(Int, String, Long, Int)]): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val recorded = versionSchema(s, root, v)
    if (es.isEmpty)
      return s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), recorded)
    def conform(raw: DataFrame, extra: Seq[(String, Column)]) = {
      val have = raw.columns.toSet
      raw.select(recorded.fields.toIndexedSeq.map { f =>
        if (have.contains(f.name))
          col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name) } ++
        extra.map { case (n, c) => c.as(n) }: _*)
    }
    val deltaShards = es.filter(_._4 > 0).map(_._1).toSet
    val (flat, chained) = es.partition(e => !deltaShards.contains(e._1))
    // The flat read passes the version's RECORDED schema explicitly:
    // one relation over every flat shard path, no mergeSchema (whose
    // distributed footer-merge cost a 32-task job per read), no
    // per-group union (whose k tiny relations each got the
    // minPartitionNum split — measured as a regression on multi-group
    // versions). The recorded schema is the manifest's truth: a
    // pre-evolution group's files simply lack the newer columns and
    // the parquet reader null-fills them, exactly what the conform
    // projection produced.
    val flatDf =
      if (flat.isEmpty) None
      else Some(conform(
        s.read.schema(recorded).parquet(flat.map {
          case (sh, dir, _, _) => s"${filesDir(root)}/$dir/shard=$sh"
        }: _*), Nil))
    val resolved =
      if (chained.isEmpty) None
      else {
        val keyCol = versionKeyCol(s, root, v)
        // one read per (group, seq) — groups bounded by the chain
        // length x touched shards, never per-file
        def readPart(entries: Seq[(Int, String, Long, Int)]) =
          entries.groupBy(e => (e._2, e._4)).toSeq
            .map { case ((dir, seq), rows) =>
              val raw = s.read.parquet(rows.map(r =>
                s"${filesDir(root)}/$dir/shard=${r._1}"): _*)
              val op = if (raw.columns.contains("op")) col("op")
                else lit("upsert")
              conform(raw, Seq("_op" -> op, "_seq" -> lit(seq)))
            }
        val (baseEs, deltaEs) = chained.partition(_._4 == 0)
        // latest-wins among the DELTAS alone: O(|delta|) rows through
        // the window, one winner per touched key ([[appendDeltas]]'s
        // per-batch key uniqueness makes the seq order total per key)
        val deltas = readPart(deltaEs).reduce(_ unionByName _)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
          .orderBy(col("_seq").desc)
        val winners = deltas
          .withColumn("_rn", org.apache.spark.sql.functions
            .row_number().over(w))
          .where(col("_rn") === 1)
        // a base row survives iff no delta touched its key — the
        // anti-join side is the deltas' distinct keys, size-gated
        // broadcast (delta-proportional, never shard-proportional).
        // The gate reads the MANIFEST's n_rows for the delta entries
        // (distinct keys <= delta rows, so the bound is conservative)
        // instead of counting with a Spark job — one job fewer per
        // chained read (guide §1.2)
        val deltaKeys = deltas.select(col(keyCol)).distinct()
        val deltaRowsTotal = deltaEs.map(_._3).sum
        val gated =
          if (deltaRowsTotal <= 2000000L) broadcast(deltaKeys)
          else deltaKeys
        val kept = baseEs match {
          case Nil => None
          case es => Some(readPart(es).reduce(_ unionByName _)
            .drop("_op", "_seq")
            .join(gated, Seq(keyCol), "left_anti"))
        }
        val applied = winners.where(col("_op") =!= "delete")
          .drop("_op", "_seq", "_rn")
        Some(kept.fold(applied)(_ unionByName applied))
      }
    (flatDf, resolved) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), recorded)
    }
  }

  /** DIFF two committed versions — and here the manifest pays its
    * third dividend: a shard whose (dir) entry is IDENTICAL in both
    * versions is PROVABLY unchanged (file groups are immutable), so
    * the diff reads only the shards whose entries differ. The
    * full-rewrite store's diff (q438) is an honest corpus-wide
    * full-outer join; this one's cost is O(changed shards) — a tiny
    * CDC merge's diff reads a handful of shard directories out of the
    * whole corpus, decided from manifest rows alone, zero data reads
    * for the pruning decision. Output: one row per changed key with
    * (op, before, after) structs — same contract as the q438 diff.
    * Returns (changed-shard count, total-shard count, diff frame) so
    * callers can grade the pruning structurally. */
  def diffVersions(s: SparkSession, root: String, from: Int, to: Int,
      keyCol: String): (Int, Int, DataFrame) = {
    import org.apache.spark.sql.functions.{struct, when}
    val ea = allEntries(s, root, from)
    val eb = allEntries(s, root, to)
    // a shard is unchanged exactly when its whole (seq -> dir) CHAIN is
    // identical — base group and every delta group
    def chains(es: Seq[(Int, String, Long, Int)]) =
      es.groupBy(_._1).view
        .mapValues(_.map(e => (e._4, e._2)).sorted).toMap
    val (aMap, bMap) = (chains(ea), chains(eb))
    val allShards = aMap.keySet ++ bMap.keySet
    val changed = allShards.filter(sh => aMap.get(sh) != bMap.get(sh))
    val a = readEntries(s, root, from,
      ea.filter(e => changed.contains(e._1)))
    val b = readEntries(s, root, to,
      eb.filter(e => changed.contains(e._1)))
    val dataCols = a.columns.filterNot(_ == keyCol).sorted.toIndexedSeq
    // across an additive evolution the FROM side lacks the new
    // columns — conform both sides to the union so before/after
    // structs are comparable (null on the older side)
    val bCols = b.columns.filterNot(_ == keyCol).sorted.toIndexedSeq
    val union = (dataCols ++ bCols).distinct.sorted
    val typeOf = (a.schema.fields ++ b.schema.fields)
      .map(f => f.name -> f.dataType).toMap
    def side(df: DataFrame, as: String) = {
      val have = df.columns.toSet
      df.select(col(keyCol),
        struct(union.map(c =>
          if (have.contains(c)) col(c)
          else lit(null).cast(typeOf(c)).as(c)): _*).as(as))
    }
    val d = side(a, "before").join(side(b, "after"),
        Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("before").isNull, "insert")
          .when(col("after").isNull, "delete")
          .when(col("before") =!= col("after"), "update")
          .as("op"),
        col("before"), col("after"))
      .where(col("op").isNotNull)
    (changed.size, allShards.size, d)
  }

  /** MERGE a CDC change set (op in insert|update|delete beside the
    * data schema) into the latest snapshot — the copy-on-write verb:
    * only the shard groups the delta's keys route to are read,
    * merged, and rewritten as ONE new file group; every untouched
    * shard's manifest entry is RE-LISTED from the parent version
    * verbatim, physical bytes shared. Replay of a committed batch id
    * is a pure no-op (effect-once — the q435 discipline). The
    * anti-join side is size-gated exactly like the full-rewrite
    * store's. Returns the new version. */
  def mergeVersion(s: SparkSession, root: String, changes: DataFrame,
      keyCol: String, seed: String, nShards: Int,
      maxRecordsPerFile: Long = 0L, batchId: Option[String] = None,
      broadcastKeyLimit: Long = 2000000L,
      preCommit: () => Unit = () => ()): Int = {
    import s.implicits._
    batchId.flatMap(id => committedBatchVersions(s, root).get(id)) match {
      case Some(v) => v
      case None =>
        val vCur = committedVersions(s, root).lastOption.getOrElse(
          throw new IllegalArgumentException(
            s"no committed snapshots under $root"))
        val cur = allEntries(s, root, vCur)
        // ONE aggregation job over the delta computes both decisions
        // the merge plans from (guide §1.2 — previously two jobs): the
        // touched shard set (collect is <= nShards rows, never
        // row-scale) and the delete/update key count for the
        // broadcast gate — keys partition by shard, so the per-shard
        // distinct counts sum to the global distinct count exactly
        val changeStats = changes
          .groupBy(shardOf(seed, col(keyCol), nShards).as("shard"))
          .agg(countDistinct(when(col("op").isin("update", "delete"),
            col(keyCol))).as("n_del_keys"),
            sum(when(col("op").isin("insert", "update"), 1L)
              .otherwise(0L)).as("n_incoming"))
          .collect()
        val touched = changeStats.map(_.getInt(0)).toSet
        val nDelKeys = changeStats.map(_.getLong(1)).sum
        val nIncoming = changeStats.map(_.getLong(2)).sum
        val (touchedEntries, keptEntries) =
          cur.partition { case (sh, _, _, _) => touched.contains(sh) }
        // the touched shards read through the shared kernel: conformed
        // to the recorded schema (post-evolution groups span schemas —
        // single-footer inference would pick one arbitrarily) and
        // merge-on-read-resolved if any carries a delta chain (the
        // copy-on-write merge then FOLDS that chain into its new
        // group)
        val before = readEntries(s, root, vCur, touchedEntries)
        val delKeys = changes.filter(col("op").isin("update", "delete"))
          .select(col(keyCol)).distinct()
        val gated =
          if (nDelKeys <= broadcastKeyLimit) broadcast(delKeys)
          else delKeys
        // the change feed's schema (minus op) IS the new version's
        // schema — schema evolution rides the merge, ADDITIVE ONLY:
        // the feed must carry every column the current version
        // records (else untouched shared groups would keep real
        // values for a "dropped" column while rewritten shards null
        // it — a half-dropped column no reader can reason about).
        // Dropping a column is a full republish (writeVersion).
        val target = changes.drop("op").schema
        val curSchema = versionSchema(s, root, vCur)
        val missing = curSchema.fieldNames.toSet --
          target.fieldNames.toSet
        require(missing.isEmpty,
          s"change feed is missing current column(s) " +
            s"${missing.mkString(", ")} — merges evolve schemas " +
            "additively; drop columns via a full writeVersion republish")
        // additive means TYPES stay put too: a feed that re-types an
        // existing column would make the recorded schema disagree with
        // the untouched shared groups' files, and the recorded-schema
        // read has no per-group cast to paper over it — reject loudly
        // (re-typing is a full writeVersion republish, like a drop)
        val targetTypes = target.fields
          .map(f => f.name -> f.dataType).toMap
        val retyped = curSchema.fields.filter(f =>
          targetTypes.get(f.name).exists(_ != f.dataType))
        require(retyped.isEmpty,
          s"change feed re-types existing column(s) " +
            retyped.map(f => s"${f.name}: ${f.dataType.simpleString} " +
              s"-> ${targetTypes(f.name).simpleString}").mkString(", ") +
            " — merges evolve schemas additively (add columns only); " +
            "re-type via a full writeVersion republish")
        val have = before.columns.toSet
        val kept0 = before.join(gated, Seq(keyCol), "left_anti")
        val kept = kept0.select(target.fields.toIndexedSeq.map { f =>
          if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name) }: _*)
        val incoming = changes.filter(col("op").isin("insert", "update"))
          .select(target.fieldNames.toIndexedSeq.map(col): _*)
        val merged = kept.unionByName(incoming)
          .withColumn("shard", shardOf(seed, col(keyCol), nShards))
        // manifest-derived output bound: kept <= the touched shards'
        // recorded rows, incoming counted by the stats job above — a
        // CDC-sized merge's bloom mint folds DRIVER-SIDE in buildGroup
        val mergedBound = touchedEntries.map(_._3).sum + nIncoming
        val (tok, counts) =
          buildGroup(merged, root, keyCol, nShards, maxRecordsPerFile,
            0 until nShards,
            knownRows =
              if (mergedBound <= 100000L) Some(mergedBound) else None)
        val newRows = counts.toSeq.sorted
          .map { case (sh, n) => (sh, tok, n, 0) }
        // fault-injection seam (the q427/preClaim discipline): a
        // barrier between the staged build and the commit, where a
        // concurrent writer may advance the store — the lost-update
        // spec drives it; production callers leave it default
        preCommit()
        commitRows(s, root,
          (keptEntries.map { case (sh, dir, n, seq) =>
            (sh, dir, n, seq) } ++ newRows).sortBy(e => (e._1, e._4)),
          org.apache.spark.sql.types.StructType(target.fields).toDDL,
          keyCol, seed, nShards, batchId, expectedParent = Some(vCur))
    }
  }

  /** MERGE-ON-READ: publish a CDC change set as DELTA GROUPS appended
    * to the latest version's manifest — the deletion-vector/delta-file
    * half of the lakehouse trade that [[mergeVersion]]'s copy-on-write
    * half doesn't cover: a copy-on-write merge rewrites every TOUCHED
    * SHARD in full, so a 6-key correction against 100 TB still
    * rewrites whole-shard gigabytes; this writes O(|delta|) BYTES — a
    * shard-routed file of the op-tagged change rows and one manifest
    * claim, nothing else. Reads of delta-bearing shards pay a bounded
    * latest-wins merge ([[readEntries]]) until [[compactDeltas]] folds
    * the chain back to flat groups; untouched shards stream flat
    * forever. Semantics are IDENTICAL to the copy-on-write merge
    * (q446 grades the equivalence bit-exactly); pick the verb by
    * write/read ratio, exactly as Delta/Iceberg deployments do.
    * No schema evolution on this path (the feed must match the
    * recorded schema) — evolution rides the copy-on-write merge.
    * Effect-once replay through the same batch-id ledger. */
  def appendDeltas(s: SparkSession, root: String, changes: DataFrame,
      keyCol: String, seed: String, nShards: Int,
      batchId: Option[String] = None): Int = {
    import s.implicits._
    batchId.flatMap(id => committedBatchVersions(s, root).get(id)) match {
      case Some(v) => v
      case None =>
        val vCur = committedVersions(s, root).lastOption.getOrElse(
          throw new IllegalArgumentException(
            s"no committed snapshots under $root"))
        val recorded = versionSchema(s, root, vCur)
        val feedCols = changes.drop("op").schema.fieldNames.toSet
        require(feedCols == recorded.fieldNames.toSet,
          s"delta feed columns ${feedCols.mkString(",")} must equal " +
            s"the recorded schema ${recorded.fieldNames.mkString(",")}" +
            " — schema evolution rides the copy-on-write merge")
        // one op per key per batch: two ops for one key land at the
        // SAME manifest seq, and latest-wins over equal seqs would be
        // an arbitrary coin flip (an upsert+delete pair in one batch
        // must be two batches — each gets its own seq). One counting
        // job over the DELTA, never the corpus.
        val (nRows, nKeys) = {
          val r = changes.agg(count(lit(1)),
            countDistinct(col(keyCol))).head()
          (r.getLong(0), r.getLong(1))
        }
        require(nKeys == nRows,
          s"delta batch carries ${nRows - nKeys} duplicate key(s) — " +
            "one op per key per batch (equal-seq ops cannot be " +
            "ordered); split conflicting ops across batches")
        val delta = changes
          .select((col("op") +: recorded.fields.toIndexedSeq.map(f =>
            col(f.name).cast(f.dataType).as(f.name))): _*)
          .withColumn("shard", shardOf(seed, col(keyCol), nShards))
        val (tok, counts) =
          buildGroup(delta, root, keyCol, nShards, 0L, 0 until nShards,
            knownRows = Some(nRows))
        val cur = allEntries(s, root, vCur)
        val maxSeq = cur.groupBy(_._1).view
          .mapValues(_.map(_._4).max).toMap
        val deltaRows = counts.toSeq.sorted.map { case (sh, n) =>
          (sh, tok, n, maxSeq.getOrElse(sh, 0) + 1) }
        commitRows(s, root,
          (cur.map { case (sh, dir, n, seq) => (sh, dir, n, seq) } ++
            deltaRows).sortBy(e => (e._1, e._4)),
          recorded.toDDL, keyCol, seed, nShards, batchId,
          expectedParent = Some(vCur))
    }
  }

  /** Fold every delta chain in the latest version back into flat
    * per-shard base groups and publish the result as the next version
    * — the maintenance verb that converts merge-on-read debt back
    * into free reads. ONLY delta-bearing shards are rewritten (their
    * resolved state lands as one new seq-0 group); flat shards'
    * entries are re-listed verbatim, so compaction cost scales with
    * the accumulated delta volume's shards, never the corpus. The
    * result is bit-identical to the pre-compaction read (q447 grades
    * it) and the folded chains' groups become unreferenced the moment
    * their last referencing version expires. */
  def compactDeltas(s: SparkSession, root: String,
      maxRecordsPerFile: Long = 0L,
      batchId: Option[String] = None): Int = {
    // effect-once like the other publish verbs: a replayed committed
    // id resolves to its version as a pure no-op
    val replay =
      batchId.flatMap(id => committedBatchVersions(s, root).get(id))
    if (replay.isDefined) return replay.get
    val vCur = committedVersions(s, root).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshots under $root"))
    val cur = allEntries(s, root, vCur)
    val deltaShards = cur.filter(_._4 > 0).map(_._1).toSet
    val (chained, flat) =
      cur.partition(e => deltaShards.contains(e._1))
    require(chained.nonEmpty,
      s"version $vCur has no delta chains to compact")
    val keyCol = versionKeyCol(s, root, vCur)
    val recorded = versionSchema(s, root, vCur)
    // the shard column must reproduce the ORIGINAL routing — taken
    // from the manifest's recorded table properties, never a caller
    val (seed, nShards) = versionRouting(s, root, vCur)
    val resolved = readEntries(s, root, vCur, chained)
      .withColumn("shard", shardOf(seed, col(keyCol), nShards))
    // manifest-derived bound on the folded output (resolution only
    // drops rows): a CDC-cadence compaction's bloom mint folds
    // DRIVER-SIDE in buildGroup
    val chainedBound = chained.map(_._3).sum
    val (tok, counts) = buildGroup(resolved, root, keyCol,
      deltaShards.size, maxRecordsPerFile, deltaShards.toSeq.sorted,
      knownRows =
        if (chainedBound <= 100000L) Some(chainedBound) else None)
    commitRows(s, root,
      (flat.map { case (sh, dir, n, seq) => (sh, dir, n, seq) } ++
        counts.toSeq.sorted.map { case (sh, n) => (sh, tok, n, 0) })
        .sortBy(e => (e._1, e._4)),
      recorded.toDDL, keyCol, seed, nShards, batchId,
      expectedParent = Some(vCur))
  }

  /** Retire all but the newest `keep` versions, then REF-COUNTED file
    * GC: a file group is deleted exactly when no surviving version's
    * manifest references it — groups shared across versions survive
    * their oldest referrer's retirement, which is what makes
    * copy-on-write storage O(history of changes). Manifest rows go
    * first (a crash mid-expire leaves unreferenced groups for the
    * next GC, never a committed version with missing files).
    *
    * EVERY group delete happens under ONE hold of the manifest lease,
    * with the live reference set recomputed INSIDE it — the same
    * lease commitRows holds while it re-verifies its referenced
    * groups exist. The two orderings compose: a merge that planned
    * against a version this expire retires either commits first (its
    * new version's references are visible to the re-check and spared)
    * or finds its groups gone and aborts loudly — never a committed
    * version with missing files, from any driver. One lease hold +
    * one reference-set computation for the whole batch (not one per
    * orphan). Crashed writers' never-referenced groups and staging
    * leftovers are vacuumed past `orphanTtlMs` of age (a younger
    * unreferenced group may be an in-flight commit). Returns the
    * retired versions. */
  def expireVersions(s: SparkSession, root: String, keep: Int,
      orphanTtlMs: Long = 3600000L): Seq[Int] = {
    require(keep >= 1, s"keep must be >= 1 (got $keep)")
    val committed = committedVersions(s, root)
    val retired = committed.dropRight(keep)
    if (retired.isEmpty && committed.isEmpty) return Nil
    // the retired versions' reference set, read BEFORE their manifest
    // rows go: these groups had a committed referrer, so if no live
    // version claims them below they are dead-by-retirement — no age
    // gate needed (an in-flight writer's group is never in this set)
    val refsRetired = retired
      .flatMap(v => entries(s, root, v).map(_._2)).toSet
    retired.foreach { v =>
      Fs.delete(s, s"${manifestDir(root)}/c_$v")
      dropCached(root, v)
    }
    val now = System.currentTimeMillis()
    Fs.withLease(s, lease(root)) {
      // the reference set of everything committed RIGHT NOW — a merge
      // that committed after the retire above is visible here and its
      // groups (including re-listed ones) are spared
      val live = committedVersions(s, root)
        .flatMap(v => entries(s, root, v).map(_._2)).toSet
      Fs.listDirNames(s, filesDir(root))
        .filterNot(live.contains)
        .foreach { d =>
          val aged = now - Fs.modTime(s, s"${filesDir(root)}/$d") >=
            orphanTtlMs
          // never-referenced groups get the age gate (an in-flight
          // writer's group exists before its manifest claim)
          if (refsRetired.contains(d) || aged)
            Fs.delete(s, s"${filesDir(root)}/$d")
        }
    }
    // staging leftovers, same age gate (outside the lease — staging is
    // never referenced by a manifest)
    Fs.listDirNames(s, s"$root/_staging")
      .map(n => s"$root/_staging/$n")
      .filter(p => now - Fs.modTime(s, p) >= orphanTtlMs)
      .foreach(Fs.delete(s, _))
    retired
  }

  /** The structural file-reuse predicate the copy-on-write queries
    * grade (one definition — q440/q443/q444 all call it): `child`
    * re-lists `parent`'s manifest entries for EXACTLY the shards the
    * delta's keys leave untouched, and a majority of shards are
    * reused. Same dir strings = same physical bytes: the manifest IS
    * the file list. */
  def reusesParentEntries(s: SparkSession, root: String, parent: Int,
      child: Int, delta: DataFrame, keyCol: String, seed: String,
      nShards: Int): Boolean = {
    import s.implicits._
    val touched = delta
      .select(shardOf(seed, col(keyCol), nShards).as("sh"))
      .distinct().as[Int].collect().toSet
    val parentOf = entries(s, root, parent).map(e => e._1 -> e._2).toMap
    val reused = entries(s, root, child).filter { case (sh, d, _) =>
      parentOf.get(sh).contains(d) }
    reused.map(_._1).toSet == parentOf.keySet.diff(touched) &&
      reused.size * 2 > nShards
  }

  /** Version `v`'s bloom manifest rows resolved to absolute file
    * paths: (shard, f, b1, b2) for exactly the files the version
    * references — each group's `_bloom` filtered to the shards this
    * version takes FROM THAT GROUP (a group shared by many versions
    * carries rows for all its shards; a version may reference only
    * some). On a DELTA-bearing version the rows include the delta
    * groups' blooms — correct as a routing verdict (no false
    * negatives: any file that could hold the key's LATEST row
    * passes), but a point reader over chains must still resolve ops
    * across the passing files (a delete row's key passes its delta
    * group's bloom BY DESIGN — that hit is how the reader learns the
    * key is gone without scanning the base). q442 grades the flat
    * form; [[pointReadLatest]] is the chain-resolving reader (q448)
    * built on exactly that signal. */
  def bloomRows(s: SparkSession, root: String, v: Int): DataFrame = {
    import s.implicits._
    bloomRowsLocal(s, root, v)
      .map { case (sh, f, b1, b2, _, _) => (sh, f, b1, b2) }
      .toDF("shard", "f", "b1", "b2")
  }

  /** Driver-side resolution of version `v`'s `_bloom` rows to
    * (shard, absolute file path, b1, b2, mins, maxs) — the manifest is
    * file-count-bounded metadata read through [[TinyParquet]], ZERO
    * Spark jobs (each consumer previously paid one read job per
    * referenced group, several per point lookup / ranged read). Rows
    * are filtered to the shards this version takes from each group and
    * ordered by (group dir, shard, fname) — deterministic. */
  private def bloomRowsLocal(s: SparkSession, root: String, v: Int)
      : Seq[(Int, String, Array[Byte], Array[Byte],
        scala.collection.Map[String, Any],
        scala.collection.Map[String, Any])] = {
    val es = entries(s, root, v)
    val byDir = es.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    byDir.toSeq.sortBy(_._1).flatMap { case (dir, shards) =>
      TinyParquet.read(s, s"${filesDir(root)}/$dir/_bloom",
          bloomRowSchema)
        .collect {
          case Seq(sh: Integer, fname: String, b1: Array[Byte],
              b2: Array[Byte], mins, maxs)
            if shards.contains(sh.intValue) =>
            (sh.intValue,
              s"${filesDir(root)}/$dir/shard=$sh/$fname", b1, b2,
              mins.asInstanceOf[scala.collection.Map[String, Any]],
              maxs.asInstanceOf[scala.collection.Map[String, Any]])
        }
    }
  }

  /** Version `v`'s ZONE-MAP rows resolved to absolute file paths:
    * (shard, f, col, min_l, max_l) — one row per (referenced file,
    * integral column), from the same commit-minted `_bloom` manifests
    * the point lookups read (min/max ride BESIDE the bitmaps: one
    * metadata family, one mint, two skipping regimes). Flat versions
    * only grade ranges through [[readVersionRanged]]; this resolver
    * itself serves any version's entries. */
  def statsRows(s: SparkSession, root: String, v: Int): DataFrame = {
    import s.implicits._
    statsRowsLocal(s, root, v)
      .toDF("shard", "f", "col", "min_l", "max_l")
  }

  /** Driver-side twin of [[statsRows]]: one (shard, file, col, min,
    * max) tuple per (referenced file, integral column) — null min/max
    * for an all-null column, exactly the exploded-map rows the Spark
    * form produced. Zero Spark jobs. */
  private def statsRowsLocal(s: SparkSession, root: String, v: Int)
      : Seq[(Int, String, String, java.lang.Long, java.lang.Long)] =
    bloomRowsLocal(s, root, v).flatMap {
      case (sh, f, _, _, mins, maxs) =>
        if (mins == null) Nil
        else mins.toSeq.sortBy(_._1).map { case (c, mn) =>
          (sh, f, c, mn.asInstanceOf[java.lang.Long],
            Option(maxs).flatMap(_.get(c)).orNull
              .asInstanceOf[java.lang.Long])
        }
    }

  /** Range-predicate read that decides its file list from the
    * MANIFEST ALONE: keep exactly the files whose [min_l, max_l] zone
    * map for `column` overlaps [lo, hi] (a file with a null stat is
    * kept — skipping must never lose a row), open only those, and
    * apply the residual filter. With sort-on-write (`sortColumns` at
    * publish) the kept set is the 1-2 files per shard that hold the
    * band — the q417 measurement on the copy-on-write layout, with
    * the decision now ZERO data reads (the full-rewrite store's zone
    * maps live in parquet footers, which planning must open; these
    * live in the commit-minted manifest). Returns (files opened,
    * files total, frame) so callers grade the pruning structurally.
    * Flat versions only: a delta chain's latest-wins resolution needs
    * every chain file regardless of range — compact first (the
    * maintenance cadence [[appendDeltasMaintained]] automates). */
  def readVersionRanged(s: SparkSession, root: String, v: Int,
      column: String, lo: Long, hi: Long): (Long, Long, DataFrame) = {
    val es = allEntries(s, root, v)
    require(es.forall(_._4 == 0),
      s"version $v carries delta chains — range-pruned reads need a " +
        "FLAT version (compactDeltas first)")
    val recorded = versionSchema(s, root, v)
    // zone-map planning from the driver-read manifest rows — zero jobs
    val stats = statsRowsLocal(s, root, v)
      .map(t => (t._2, t._3, Option(t._4).map(_.longValue),
        Option(t._5).map(_.longValue)))
    require(stats.nonEmpty, s"version $v has no zone-map rows — " +
      "groups minted before stats existed must be republished")
    val allFiles = stats.map(_._1).distinct
    val colStats = stats.filter(_._2 == column)
    require(colStats.nonEmpty,
      s"no zone maps for column '$column' (integral columns only)")
    val statted = colStats.map(_._1).toSet
    val kept = colStats.collect {
      case (f, _, mn, mx)
        if mn.forall(_ <= hi) && mx.forall(_ >= lo) => f
    } ++ allFiles.filterNot(statted.contains)
    val df =
      if (kept.isEmpty)
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), recorded)
      else readFilesConformed(s, root, kept.toIndexedSeq, recorded)
        .where(col(column).between(lo, hi))
    (kept.size.toLong, allFiles.length.toLong, df)
  }

  /** Read absolute data-file paths as ONE relation with the version's
    * RECORDED schema passed explicitly — no mergeSchema (a 32-task
    * distributed footer-merge job per read), no per-group union (k
    * tiny relations each paying the minPartitionNum split). The
    * recorded schema is the manifest's truth: files from pre-evolution
    * groups lack the newer columns and the parquet reader null-fills
    * them. */
  private def readFilesConformed(s: SparkSession, root: String,
      files: Seq[String],
      recorded: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(recorded).parquet(files: _*)

  /** A chain-aware ranged read's audit shape: zone-map pruning applied
    * to the FLAT shards, full chain resolution on the delta-bearing
    * ones, and the file accounting callers grade structurally. */
  final case class RangedRead(flatFilesOpened: Long,
      flatFilesTotal: Long, deltaShardFiles: Long, deltaShards: Long,
      nShards: Long, df: DataFrame)

  /** Range read over ANY version — the chain-aware completion of
    * [[readVersionRanged]]'s flat-only contract: shards WITHOUT delta
    * chains prune their file list from the manifest's zone maps
    * exactly as the flat read does (zero data reads for the
    * decision), while delta-BEARING shards are resolved latest-wins
    * over their full chains first and range-filtered after — a chain
    * row can move a key INTO or OUT of the band (an update changing
    * the column) or remove it entirely (a delete), so no per-file
    * skipping decision is sound there until [[compactDeltas]] folds
    * the chain flat again. Between compactions the range tax is
    * therefore: band-overlapping flat files + the touched shards'
    * chains — both minorities of the fleet on a CDC cadence, and both
    * reported in the returned [[RangedRead]] so callers can assert
    * it. */
  def readVersionRangedResolved(s: SparkSession, root: String, v: Int,
      column: String, lo: Long, hi: Long): RangedRead = {
    val es = allEntries(s, root, v)
    val deltaShardSet = es.filter(_._4 > 0).map(_._1).toSet
    val (deltaEs, _) = es.partition(e => deltaShardSet.contains(e._1))
    val recorded = versionSchema(s, root, v)
    val (_, nShards) = versionRouting(s, root, v)
    // zone-map planning from the driver-read manifest rows — zero jobs
    val stats = statsRowsLocal(s, root, v)
      .map(t => (t._1, t._2, t._3, Option(t._4).map(_.longValue),
        Option(t._5).map(_.longValue)))
    require(stats.nonEmpty, s"version $v has no zone-map rows — " +
      "groups minted before stats existed must be republished")
    val flatStats = stats.filterNot(t => deltaShardSet.contains(t._1))
    val flatFiles = flatStats.map(_._2).distinct
    val colStats = flatStats.filter(_._3 == column)
    val statted = colStats.map(_._2).toSet
    val kept = colStats.collect {
      case (_, f, _, mn, mx)
        if mn.forall(_ <= hi) && mx.forall(_ >= lo) => f
    } ++ flatFiles.filterNot(statted.contains)
    val deltaFiles = stats
      .filter(t => deltaShardSet.contains(t._1)).map(_._2).distinct
    val flatDf =
      if (kept.isEmpty) None
      else Some(readFilesConformed(s, root, kept.toIndexedSeq, recorded)
        .where(col(column).between(lo, hi)))
    val deltaDf =
      if (deltaEs.isEmpty) None
      else Some(readEntries(s, root, v, deltaEs)
        .where(col(column).between(lo, hi)))
    val df = (flatDf, deltaDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), recorded)
    }
    RangedRead(kept.size.toLong, flatFiles.length.toLong,
      deltaFiles.length.toLong, deltaShardSet.size.toLong,
      nShards.toLong, df)
  }

  /** One resolved point read: the key's surviving row values (aligned
    * to the version's recorded schema; empty = absent or deleted),
    * the files actually OPENED, and whether the verdict came from
    * delta files alone (base never opened). */
  final case class PointRead(key: Long, rows: Seq[Seq[Any]],
      filesOpened: Seq[String], resolvedFromDeltaAlone: Boolean)

  /** CHAIN-RESOLVING bloom-routed point lookup — the reader
    * [[bloomRows]]' routing verdict promises, over FLAT and
    * DELTA-BEARING versions alike: each key routes to ONE shard
    * driver-side (no Spark job — [[shardOfKey]]), the version's bloom
    * rows for that shard pick the passing files, and the passing
    * files are probed HIGHEST-SEQ-FIRST with early stop — the first
    * seq level that holds the key decides (a delta level's `op` says
    * upsert-or-deleted; the base level says present). So on a
    * delta-bearing shard a DELETED key's lookup ends at its delta
    * file's delete marker — the base group, which genuinely contains
    * the key's pre-delete row and passes its bloom as a true
    * positive, is NEVER OPENED; and an updated key's latest value is
    * read from O(|delta|) bytes. [[appendDeltas]]' one-op-per-key-
    * per-batch invariant makes the per-key seq order total, so
    * "highest seq" is well-defined. Point-lookup cost at any version:
    * one manifest read, one shard's bloom rows, and the passing
    * files of the winning seq level — O(1) metadata + O(1) data
    * files out of the fleet. */
  def pointReadLatest(s: SparkSession, root: String, v: Int,
      keys: Seq[Long]): Seq[PointRead] = {
    import s.implicits._
    val es = allEntries(s, root, v)
    val keyCol = versionKeyCol(s, root, v)
    val (seed, nShards) = versionRouting(s, root, v)
    val recorded = versionSchema(s, root, v)
    val routed = keys.map(k => k -> shardOfKey(seed, k, nShards)).toMap
    val needed = routed.values.toSet
    // (shard, seq, path, b1, b2) for the needed shards only — the
    // _bloom manifests are read DRIVER-SIDE (TinyParquet), so routing
    // metadata for a point lookup costs zero Spark jobs (previously
    // one tiny read job per referenced group, several per lookup)
    val fileMeta: Seq[(Int, Int, String,
        java.util.BitSet, java.util.BitSet)] =
      es.groupBy(_._2).toSeq.flatMap { case (dir, dirEs) =>
        val want = dirEs.collect {
          case (sh, _, _, seq) if needed.contains(sh) => sh -> seq
        }.toMap
        if (want.isEmpty) Nil
        else TinyParquet.read(s, s"${filesDir(root)}/$dir/_bloom",
            bloomRowSchema).collect {
          case Seq(shI: Integer, fname: String, b1: Array[Byte],
              b2: Array[Byte], _, _) if want.contains(shI.intValue) =>
            val sh = shI.intValue
            (sh, want(sh),
              s"${filesDir(root)}/$dir/shard=$sh/$fname",
              java.util.BitSet.valueOf(b1),
              java.util.BitSet.valueOf(b2))
          }
      }
    // per-key passing files per seq level, from metadata alone
    val passingByKey: Map[Long, Seq[(Int, Seq[String])]] = keys.map { k =>
      // the bitmap mixers keep the dividend's sign and the MINT
      // rejects negative positions loudly (BloomManifest.mix scaladoc)
      // — so a negative probe key structurally cannot be in any file:
      // report absent instead of handing BitSet.get a negative index
      val (i1, i2) = (BloomManifest.h1Long(k), BloomManifest.h2Long(k))
      val passing =
        if (i1 < 0 || i2 < 0) Nil
        else fileMeta.filter { case (sh, _, _, b1, b2) =>
          sh == routed(k) && b1.get(i1) && b2.get(i2)
        }
      k -> passing.groupBy(_._2).toSeq.sortBy(-_._1)
        .map { case (seq, fs) => (seq, fs.map(_._3)) }
    }.toMap
    // LEVEL-SYNCHRONIZED batched probe: walk seq levels highest-first
    // and, per level, read each file group ONCE for every still-
    // unresolved key routed to it (isin filter) — one job per (level,
    // group) instead of one per (key, level), with the sequential
    // walk's per-key semantics preserved exactly: a key's verdict
    // level, its opened-file attribution (its OWN bloom-passing files
    // at the levels it visited), and the early stop that never opens
    // base under a delta verdict are all per-key as before. Batching
    // cannot leak rows between keys: a row for key k lives only in
    // files that contain k, all of which pass k's bloom (no false
    // negatives), so filtering the union read back to each key's own
    // hits reproduces the solo read.
    val verdicts = scala.collection.mutable.Map.empty[Long,
      (Seq[Seq[Any]], Int)]
    val openedBy = scala.collection.mutable.Map.empty[Long,
      Vector[String]].withDefaultValue(Vector.empty)
    val allSeqsDesc = passingByKey.values.flatMap(_.map(_._1))
      .toSeq.distinct.sorted.reverse
    // A FLAT recorded schema (every field a TinyParquet-readable
    // primitive — the storage fixtures' shape) probes DRIVER-SIDE: a
    // point lookup's winning level is 1-2 capped files, and reading
    // them through the driver parquet reader is how a real point-get
    // behaves — zero Spark jobs (previously one tiny read job per
    // (level, group)). Nested/exotic schemas keep the Spark read.
    def tinyTypeOf(t: org.apache.spark.sql.types.DataType)
        : Option[String] = t match {
      case org.apache.spark.sql.types.LongType => Some("long")
      case org.apache.spark.sql.types.IntegerType => Some("int")
      case org.apache.spark.sql.types.DoubleType => Some("double")
      case org.apache.spark.sql.types.StringType => Some("string")
      case _ => None
    }
    val tinySchema: Option[TinyParquet.Schema] = {
      val m = recorded.fields.toSeq
        .map(f => tinyTypeOf(f.dataType).map(f.name -> _))
      if (m.forall(_.isDefined)) Some(m.map(_.get)) else None
    }
    def keyAsLong(v: Any): Option[Long] = v match {
      case l: java.lang.Long => Some(l.longValue)
      case i: java.lang.Integer => Some(i.longValue)
      case null => None
      case other => Some(other.toString.toLong)
    }
    for (seq <- allSeqsDesc) {
      val active = keys.filter(k => !verdicts.contains(k) &&
        passingByKey(k).exists(_._1 == seq))
      if (active.nonEmpty) {
        active.foreach { k =>
          openedBy(k) = openedBy(k) ++
            passingByKey(k).find(_._1 == seq).get._2
        }
        // group this level's files by their file GROUP (one dir =
        // uniform schema); a key's hits at one level live in exactly
        // one group (one manifest entry per (shard, seq))
        val byDir = active.flatMap { k =>
          passingByKey(k).find(_._1 == seq).get._2.map(p => (p, k))
        }.groupBy(_._1.split("/shard=").head)
        byDir.foreach { case (_, pathKeys) =>
          val paths = pathKeys.map(_._1).distinct
          val ks = pathKeys.map(_._2).distinct
          // (key, op-if-any, recorded-aligned values) per matching row
          val hits: Seq[(Long, Option[String], Seq[Any])] =
            tinySchema match {
              case Some(fl) =>
                val schema = fl :+ ("op" -> "string")
                val keyIdx = recorded.fieldIndex(keyCol)
                paths.flatMap(p => TinyParquet.readFile(s,
                    new org.apache.hadoop.fs.Path(p), schema))
                  .flatMap { r =>
                    keyAsLong(r(keyIdx)).filter(ks.contains).map(kv =>
                      (kv, Option(r.last.asInstanceOf[String]), r.init))
                  }
              case None =>
                s.read.parquet(paths: _*)
                  .where(col(keyCol).isin(ks: _*)).collect().toSeq
                  .map { row =>
                    val have = row.schema.fieldNames.toSet
                    val vals = recorded.fields.toSeq.map(f =>
                      if (have.contains(f.name)) row.getAs[Any](f.name)
                      else null)
                    (keyAsLong(row.getAs[Any](keyCol)).get,
                      if (have.contains("op"))
                        Option(row.getAs[String]("op"))
                      else None,
                      vals)
                  }
            }
          hits.groupBy(_._1).foreach { case (k, hit) =>
            val surviving =
              if (seq > 0 && hit.head._2.contains("delete")) Nil
              else hit.map(_._3)
            verdicts(k) = (surviving, seq)
          }
        }
      }
    }
    keys.map { k =>
      val v = verdicts.get(k)
      PointRead(k, v.map(_._1).getOrElse(Nil), openedBy(k),
        v.exists(_._2 > 0))
    }
  }

  /** The standing-consumer maintenance discipline (q313/q430's,
    * applied to merge-on-read): publish `changes` as a delta batch,
    * then — once ANY shard's chain reaches `maxChainLen` delta levels
    * — fold every chain back to flat groups, bounding the read-side
    * resolution rent a standing CDC feed would otherwise grow without
    * limit. Both verbs ride the committed-batch ledger, so an
    * at-least-once replay is effect-once end to end: a replayed
    * append resolves to its version untouched, and the compaction
    * either already committed (its id resolves) or re-fires on the
    * still-long chain it crashed before folding — same end state
    * either way. Returns (delta version, compacted version if one
    * was published). */
  def appendDeltasMaintained(s: SparkSession, root: String,
      changes: DataFrame, keyCol: String, seed: String, nShards: Int,
      maxChainLen: Int, batchId: Option[String] = None)
      : (Int, Option[Int]) = {
    require(maxChainLen >= 1,
      s"maxChainLen must be >= 1 (got $maxChainLen)")
    val dv = appendDeltas(s, root, changes, keyCol, seed, nShards,
      batchId)
    val cur = allEntries(s, root, committedVersions(s, root).last)
    val chainLen = cur.groupBy(_._1).valuesIterator
      .map(_.count(_._4 > 0)).maxOption.getOrElse(0)
    if (chainLen >= maxChainLen)
      (dv, Some(compactDeltas(s, root,
        batchId = batchId.map(id => s"$id-compact"))))
    else (dv, None)
  }
}
