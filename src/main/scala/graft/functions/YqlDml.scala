package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Execution of the YQL script DML verbs — `UPSERT INTO`, `REPLACE
  * INTO`, `DELETE FROM`, `UPDATE` (SQLv1.g.in:579,968-969; semantics
  * yt/docs en/user-guide/dynamic-tables/sorted-dynamic-tables.md:
  * 171-177) — against KEYED session-catalog tables.
  *
  * A keyed table is one created with `PRIMARY KEY (...)` in the
  * script DDL (or any parquet table carrying the
  * `graft.key_columns` table property). The verbs materialize the
  * same row image DynTable's write-log model produces after a
  * latest-wins read:
  *
  *   - UPSERT: per-key merge; listed columns take the source value,
  *     unlisted columns KEEP the current row's value (new keys get
  *     null there) — `insert_rows` with update semantics;
  *   - REPLACE: per-key full-row image; unlisted columns become null
  *     for every written key;
  *   - DELETE ... WHERE / ON: row removal by predicate or by key
  *     tuples — `delete_rows`;
  *   - UPDATE ... SET ... WHERE / ON: partial update of existing rows
  *     (keys immutable); SET expressions all read the OLD row
  *     (simultaneous assignment).
  *
  * Scale shape: every verb is ONE distributed pass — a key-partitioned
  * full/left outer join (or a filter) producing the new table image,
  * staged as its own parquet table and swapped in. The two-phase
  * write is deliberate: Spark (correctly) refuses a self-referencing
  * INSERT OVERWRITE, and on a cluster the stage-then-swap is what a
  * metastore-atomic rename wants. Nothing is collected to the driver.
  */
object YqlDml {

  /** Table property naming the key columns of a keyed table. */
  val KeyProp = "graft.key_columns"

  /** Table property set by the DDL when every key column is NOT NULL
    * (parquet reads erase DDL nullability, so the fact must ride the
    * catalog): lets the merge join use plain key equality, which a
    * bucketed table satisfies without shuffling. */
  val NonNullProp = "graft.keys_nonnull"

  /** DROP TABLE IF EXISTS plus removal of a stale warehouse location.
    * With the default in-memory catalog a restart forgets the table
    * metadata but leaves its managed directory on disk, so the next
    * CREATE TABLE fails with locationAlreadyExists; a metastore-backed
    * deployment doesn't need this. */
  def dropTableDeep(spark: SparkSession, name: String): Unit = {
    val bare = name.stripPrefix("`").stripSuffix("`")
    // a keyed table's registered secondary indexes go with it
    if (spark.catalog.tableExists(bare))
      indexes(spark, name).values.foreach { case (_, _, idxTable) =>
        if (idxTable.nonEmpty && idxTable != bare)
          dropTableDeep(spark, s"`$idxTable`")
      }
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if (wh.nonEmpty) {
      val base = try {
        val u = new java.net.URI(wh)
        if (u.getScheme == null || u.getScheme == "file") u.getPath else null
      } catch { case _: Exception => wh }
      if (base != null) {
        val dir = new java.io.File(base,
          name.stripPrefix("`").stripSuffix("`").toLowerCase)
        if (dir.exists)
          new scala.reflect.io.Directory(dir).deleteRecursively()
      }
    }
  }

  def keyColumns(spark: SparkSession, target: String): Seq[String] =
    spark.sql(s"SHOW TBLPROPERTIES $target").collect()
      .collectFirst { case r if r.getString(0) == KeyProp => r.getString(1) }
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  def keysNonNull(spark: SparkSession, target: String): Boolean =
    spark.sql(s"SHOW TBLPROPERTIES $target").collect()
      .exists(r => r.getString(0) == NonNullProp && r.getString(1) == "true")

  private def requireKeyed(spark: SparkSession, target: String,
      verb: String): Seq[String] = {
    val ks = keyColumns(spark, target)
    if (ks.isEmpty) throw new IllegalArgumentException(
      s"$verb targets a keyed (sorted dynamic) table; create $target with " +
      s"PRIMARY KEY (...) or TBLPROPERTIES('$KeyProp'='k1,k2')")
    ks
  }

  /** Align a source frame onto the target schema: an explicit column
    * list renames positionally; a bare VALUES source (automatic
    * `colN` names) maps positionally onto the full schema; a SELECT
    * source contributes its own column names. */
  private def aligned(src: DataFrame, cols: Seq[String],
      schema: StructType, verb: String): DataFrame =
    if (cols.nonEmpty) {
      require(cols.length == src.columns.length,
        s"$verb column list has ${cols.length} names but the source has " +
        s"${src.columns.length} columns")
      src.toDF(cols: _*)
    } else if (src.columns.forall(_.matches("col\\d+"))) {
      require(src.columns.length == schema.length,
        s"$verb VALUES arity ${src.columns.length} does not match the " +
        s"target's ${schema.length} columns; add a column list")
      src.toDF(schema.fieldNames.toSeq: _*)
    } else src

  private def checkColumns(listed: Seq[String], keys: Seq[String],
      schema: StructType, verb: String): Unit = {
    val bad = listed.filterNot(schema.fieldNames.contains)
    require(bad.isEmpty, s"$verb: unknown columns ${bad.mkString(", ")}")
    require(keys.forall(listed.contains),
      s"$verb source must include every key column (${keys.mkString(", ")})")
  }

  /** The merge-join key condition. Null-safe `<=>` in general (YT key
    * columns may be null); PLAIN `===` when every key field is
    * non-nullable in the table schema — the equality Spark can satisfy
    * from a BUCKETED table's hash distribution, so the big side of the
    * merge never shuffles (a `<=>` join hashes coalesce(k)/isnull(k)
    * and cannot reuse the buckets). A null-keyed source row then
    * surfaces as a write-time null-constraint error, like the
    * reference's non-null key check. */
  private def keyCond(keys: Seq[String], nonNull: Boolean): Column =
    keys.map(k =>
      if (nonNull) col(s"t.$k") === col(s"s.$k")
      else col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)

  /** `UPSERT INTO` / `REPLACE INTO`: full-outer key merge of the
    * source onto the current table image. Duplicate source keys are
    * collapsed (`dropDuplicates` on the keys): the reference's
    * last-wins applies to an ORDERED write stream, and a DataFrame
    * source has no order to win by. */
  def upsert(spark: SparkSession, target: String, src0: DataFrame,
      cols: Seq[String], replace: Boolean,
      returning: Option[Seq[String]] = None): Option[DataFrame] = {
    val verb = if (replace) "REPLACE INTO" else "UPSERT INTO"
    val keys = requireKeyed(spark, target, verb)
    val cur = spark.table(target)
    val schema = cur.schema
    val src = aligned(src0, cols, schema, verb)
    checkColumns(src.columns.toSeq, keys, schema, verb)
    val (image, written) =
      upsertImage(cur, src, keys, replace, keysNonNull(spark, target))
    // RETURNING: the WRITTEN rows' new image (rows whose key the
    // source carried), snapshotted BEFORE the swap so a
    // self-referencing source cannot re-read post-write state
    val ret = returning.map(cols0 => snapshot(written, cols0, schema))
    overwrite(spark, target, image)
    ret
  }

  /** The UPSERT/REPLACE merge image: (full new table image, written
    * rows' new image). One full-outer sort-merge join keyed on the
    * table keys — the plan shape YqlDmlPlanSpec pins: exactly the two
    * key exchanges (full outer cannot broadcast), no nested-loop or
    * cartesian anywhere, the projection folded into the join output. */
  private[graft] def upsertImage(cur: DataFrame, src: DataFrame,
      keys: Seq[String], replace: Boolean,
      nonNullKeys: Boolean = false): (DataFrame, DataFrame) = {
    val schema = cur.schema
    val listed = src.columns.toSeq
    val s = src.dropDuplicates(keys).withColumn("__gs", lit(true)).alias("s")
    val t = cur.alias("t")
    val cond = keyCond(keys, nonNullKeys)
    val sExists = col("s.__gs")
    val out = schema.fields.toSeq.map { f =>
      val c = f.name
      val merged =
        if (keys.contains(c)) coalesce(col(s"s.$c"), col(s"t.$c"))
        else if (listed.contains(c))
          when(sExists, col(s"s.$c")).otherwise(col(s"t.$c"))
        else if (replace) when(sExists, lit(null)).otherwise(col(s"t.$c"))
        else col(s"t.$c")
      merged.cast(f.dataType).as(c)
    }
    val joined = t.join(s, cond, "full_outer")
    (joined.select(out: _*), joined.filter(sExists).select(out: _*))
  }

  /** `INSERT OR ABORT|REVERT|IGNORE INTO` (SQLv1.g.in:579): keyed
    * insert with a conflict policy — ABORT/REVERT fail the statement
    * when ANY source key already exists (checked with one
    * `limit(1)`-bounded job, nothing written); IGNORE inserts only the
    * non-conflicting keys. New rows APPEND through a stage table (no
    * existing row changes, so no full-image rewrite — at 100 TB this
    * writes only the inserted rows). */
  def insertOr(spark: SparkSession, target: String, src0: DataFrame,
      cols: Seq[String], mode: String,
      returning: Option[Seq[String]] = None): Option[DataFrame] = {
    val verb = s"INSERT OR ${mode.toUpperCase} INTO"
    val keys = requireKeyed(spark, target, verb)
    val cur = spark.table(target)
    val schema = cur.schema
    val src = aligned(src0, cols, schema, verb)
    val listed = src.columns.toSeq
    checkColumns(listed, keys, schema, verb)
    val s = src.dropDuplicates(keys)
    if (mode.equalsIgnoreCase("abort") || mode.equalsIgnoreCase("revert")) {
      val conflict = s.join(cur.select(keys.map(col): _*), keys, "left_semi")
        .select(keys.map(col): _*).limit(1).collect()
      if (conflict.nonEmpty) throw new IllegalArgumentException(
        s"$verb: key already exists " +
        conflict.head.toSeq.mkString("(", ", ", ")"))
    }
    val fresh =
      if (mode.equalsIgnoreCase("ignore"))
        s.join(cur.select(keys.map(col): _*), keys, "left_anti")
      else s
    val rows = fresh.select(schema.fields.toSeq.map { f =>
      (if (listed.contains(f.name)) col(f.name)
       else lit(null)).cast(f.dataType).as(f.name)
    }: _*)
    val ret = returning.map(cols0 => snapshot(rows, cols0, schema))
    append(spark, target, rows)
    ret
  }

  /** `DELETE FROM t WHERE p` (rows where p is TRUE go; NULL keeps) /
    * `DELETE FROM t ON <keys>` (anti join on the key columns) /
    * bare `DELETE FROM t` (every row). */
  def delete(spark: SparkSession, target: String, where: Option[Column],
      keySource: Option[DataFrame],
      returning: Option[Seq[String]] = None): Option[DataFrame] = {
    val keys = requireKeyed(spark, target, "DELETE FROM")
    val cur = spark.table(target)
    val remaining = (where, keySource) match {
      case (Some(p), None) => cur.filter(!coalesce(p, lit(false)))
      case (None, Some(ks)) =>
        require(ks.columns.toSeq.sorted == keys.sorted,
          s"DELETE ... ON source must project exactly the key columns " +
          s"(${keys.mkString(", ")}), got (${ks.columns.mkString(", ")})")
        cur.join(ks.dropDuplicates(), keys, "left_anti")
      case (None, None) => cur.limit(0)
      case _ => throw new IllegalArgumentException(
        "DELETE takes WHERE or ON, not both")
    }
    // RETURNING: the DELETED rows (old image), snapshotted pre-swap
    val deleted = (where, keySource) match {
      case (Some(p), None) => cur.filter(coalesce(p, lit(false)))
      case (None, Some(ks)) => cur.join(ks.dropDuplicates(), keys, "left_semi")
      case _ => cur
    }
    val ret = returning.map(cols0 => snapshot(deleted, cols0, cur.schema))
    overwrite(spark, target, remaining)
    ret
  }

  /** `UPDATE t SET c = e, ... [WHERE p]`: one projection pass — every
    * SET expression evaluates against the OLD row, gated by the
    * predicate. Key columns cannot be assigned. */
  def update(spark: SparkSession, target: String,
      sets: Seq[(String, Column)], where: Option[Column],
      returning: Option[Seq[String]] = None): Option[DataFrame] = {
    val keys = requireKeyed(spark, target, "UPDATE")
    val cur = spark.table(target)
    val schema = cur.schema
    require(sets.map(_._1).distinct.length == sets.length,
      "duplicate column in UPDATE SET")
    val badKey = sets.map(_._1).filter(keys.contains)
    require(badKey.isEmpty,
      s"UPDATE cannot change key columns: ${badKey.mkString(", ")}")
    val unknown = sets.map(_._1).filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty,
      s"UPDATE: unknown columns ${unknown.mkString(", ")}")
    val setMap = sets.toMap
    val cond = where.map(p => coalesce(p, lit(false))).getOrElse(lit(true))
    val out = schema.fields.toSeq.map { f =>
      setMap.get(f.name) match {
        case Some(e) =>
          when(cond, e).otherwise(col(f.name)).cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }
    // RETURNING: the UPDATED rows' NEW image — the gate evaluates over
    // the old row, the projection carries the assignments
    val ret = returning.map(cols0 =>
      snapshot(cur.filter(cond).select(out: _*), cols0, schema))
    overwrite(spark, target, cur.select(out: _*))
    ret
  }

  /** `UPDATE t ON <select>`: by-key partial update — the source's
    * non-key columns overwrite matching rows; source rows with no
    * matching key are IGNORED (unlike UPSERT, no insert). */
  def updateOn(spark: SparkSession, target: String, src0: DataFrame,
      returning: Option[Seq[String]] = None): Option[DataFrame] = {
    val keys = requireKeyed(spark, target, "UPDATE ... ON")
    val cur = spark.table(target)
    val schema = cur.schema
    val src = aligned(src0, Nil, schema, "UPDATE ... ON")
    val listed = src.columns.toSeq
    checkColumns(listed, keys, schema, "UPDATE ... ON")
    val dataCols = listed.filterNot(keys.contains)
    require(dataCols.nonEmpty,
      "UPDATE ... ON source must carry at least one non-key column")
    val s = src.dropDuplicates(keys).withColumn("__gs", lit(true)).alias("s")
    val t = cur.alias("t")
    val cond = keyCond(keys, keysNonNull(spark, target))
    val sExists = col("s.__gs")
    val out = schema.fields.toSeq.map { f =>
      val c = f.name
      val v =
        if (dataCols.contains(c))
          when(sExists, col(s"s.$c")).otherwise(col(s"t.$c"))
        else col(s"t.$c")
      v.cast(f.dataType).as(c)
    }
    val image = t.join(s, cond, "left_outer")
    val ret = returning.map(cols0 =>
      snapshot(image.filter(sExists).select(out: _*), cols0, schema))
    overwrite(spark, target, image.select(out: _*))
    ret
  }

  /** Materialize a RETURNING set before the table swap: project the
    * requested columns (empty = all, schema order) and localCheckpoint
    * eagerly — the result must not lazily re-read the target after the
    * overwrite. The set is bounded by the statement's affected rows. */
  private def snapshot(df: DataFrame, cols: Seq[String],
      schema: StructType): DataFrame = {
    val unknown = cols.filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty,
      s"RETURNING: unknown columns ${unknown.mkString(", ")}")
    val proj = if (cols.isEmpty) df else df.select(cols.map(col): _*)
    proj.localCheckpoint(true)
  }

  /** Two-phase table rewrite: stage the new image as its own parquet
    * table (a fully distributed write), then overwrite the target from
    * the stage and drop it. Direct self-referencing INSERT OVERWRITE
    * is illegal in Spark; on a cluster this staging is also the
    * metastore-atomic swap you want. */
  private def overwrite(spark: SparkSession, target: String,
      df: DataFrame): Unit = staged(spark, target, df, overwrite = true)

  /** Stage-then-append: for inserts that change no existing row the
    * write is only the NEW rows (the stage breaks the read-from-target
    * lineage Spark rightly refuses). */
  private def append(spark: SparkSession, target: String,
      df: DataFrame): Unit = staged(spark, target, df, overwrite = false)

  private def staged(spark: SparkSession, target: String,
      df: DataFrame, overwrite: Boolean): Unit = {
    val stage = "graft_dml_stage_" +
      java.lang.Integer.toHexString(target.hashCode & 0x7fffffff)
    // dropTableDeep, not bare DROP: an ABORTED earlier statement (e.g.
    // a unique-index conflict raised mid-write) can leave an orphan
    // stage DIRECTORY with no catalog entry, which would fail the next
    // saveAsTable with LOCATION_ALREADY_EXISTS
    dropTableDeep(spark, s"`$stage`")
    // REBALANCE before the write (guide: size output files to the AQE
    // advisory): without it the staged image inherits the plan's
    // shuffle partitioning and commits one near-empty parquet file per
    // partition — the driver-side commit renames dominate small DML
    // statements. With AQE the hint coalesces to advisory-sized files
    // at ANY scale (one file at test scale, ~64 MB files on a cluster).
    df.hint("rebalance").write.format("parquet").saveAsTable(stage)
    // SYNC secondary indexes rebuild from the NEW image into their own
    // stages BEFORE the target swap: a failed rebuild (e.g. a unique
    // conflict) aborts the whole statement with the target untouched —
    // the reference's atomic write+index contract. A full rebuild per
    // statement is the correct full-sync semantics; delta maintenance
    // is the production optimization the per-key merge already enables.
    val idxs = indexes(spark, target)
    val idxStages = idxs.toSeq.map { case (name, (cols, unique, idxTable)) =>
      val image =
        if (overwrite) spark.table(s"`$stage`")
        else spark.table(target).unionByName(spark.table(s"`$stage`"))
      val keys = keyColumns(spark, target)
      val built = if (unique) graft.plans.SecondaryIndex.buildUnique(image, cols, keys)
        else graft.plans.SecondaryIndex.build(image, cols, keys)
      val is = s"${idxTable}__stage"
      dropTableDeep(spark, s"`$is`")
      built.hint("rebalance").write.format("parquet").saveAsTable(is)
      (idxTable, is)
    }
    val kw = if (overwrite) "OVERWRITE TABLE" else "INTO"
    try {
      spark.sql(s"INSERT $kw $target SELECT * FROM `$stage`")
      idxStages.foreach { case (idxTable, is) =>
        spark.sql(s"INSERT OVERWRITE TABLE `$idxTable` SELECT * FROM `$is`")
      }
    } finally {
      dropTableDeep(spark, s"`$stage`")
      idxStages.foreach { case (_, is) => dropTableDeep(spark, s"`$is`") }
    }
  }

  // ——— secondary indexes (SQLv1.g.in:744 alter_table_add_index) ———

  /** Prefix of per-index table properties on the primary:
    * `graft.index.<name>` = `cols=c1,c2;table=<idx table>[;unique]`. */
  val IndexPropPrefix = "graft.index."

  /** Registered indexes of `target`: name → (cols, unique, table). */
  def indexes(spark: SparkSession, target: String)
      : Map[String, (Seq[String], Boolean, String)] =
    spark.sql(s"SHOW TBLPROPERTIES $target").collect()
      .filter(_.getString(0).startsWith(IndexPropPrefix))
      .map { r =>
        val name = r.getString(0).stripPrefix(IndexPropPrefix)
        val parts = r.getString(1).split(";").map(_.trim)
        val cols = parts.collectFirst {
          case p if p.startsWith("cols=") =>
            p.stripPrefix("cols=").split(",").toSeq.map(_.trim)
        }.getOrElse(Nil)
        val table = parts.collectFirst {
          case p if p.startsWith("table=") => p.stripPrefix("table=")
        }.getOrElse("")
        name -> ((cols, parts.contains("unique"), table))
      }.toMap

  /** `ALTER TABLE t ADD INDEX name GLOBAL [UNIQUE] ON (cols)`: backfill
    * the index table from the current image (one distributed
    * range-partitioned write) and register it on the primary; later
    * DML statements maintain it synchronously. */
  def addIndex(spark: SparkSession, target: String, name: String,
      cols: Seq[String], unique: Boolean): Unit = {
    val keys = requireKeyed(spark, target, "ADD INDEX")
    val cur = spark.table(target)
    val bad = cols.filterNot(cur.schema.fieldNames.contains)
    require(bad.isEmpty, s"ADD INDEX: unknown columns ${bad.mkString(", ")}")
    require(!indexes(spark, target).contains(name),
      s"index $name already exists on $target")
    val idxTable = s"${target.stripPrefix("`").stripSuffix("`")}__idx_$name"
    dropTableDeep(spark, s"`$idxTable`")
    val built = if (unique) graft.plans.SecondaryIndex.buildUnique(cur, cols, keys)
      else graft.plans.SecondaryIndex.build(cur, cols, keys)
    built.hint("rebalance").write.format("parquet").saveAsTable(idxTable)
    val spec = s"cols=${cols.mkString(",")};table=$idxTable" +
      (if (unique) ";unique" else "")
    spark.sql(s"ALTER TABLE $target SET TBLPROPERTIES " +
      s"('$IndexPropPrefix$name'='$spec')")
  }

  def dropIndex(spark: SparkSession, target: String, name: String): Unit = {
    val idx = indexes(spark, target).getOrElse(name,
      throw new IllegalArgumentException(s"no index $name on $target"))
    spark.sql(s"ALTER TABLE $target UNSET TBLPROPERTIES " +
      s"('$IndexPropPrefix$name')")
    dropTableDeep(spark, s"`${idx._3}`")
  }
}
