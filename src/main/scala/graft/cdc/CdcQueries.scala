package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-contract query entries for the CDC core — each is the
  * batch-checkable face of a streaming capability (see CdcStreamJob for
  * the continuous path over the identical operators).
  *
  * The canonical changelog derives deterministically from the `events`
  * table (CdcOps.userChangelog): op ∈ {c,u,d} mapped from event_type,
  * ordered per user by (ts_ms, event_id).
  */
object CdcQueries {

  private val changeSql =
    """SELECT user_id,
      |  CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
      |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
      |  event_id AS seq,
      |  event_type AS last_event_type, value AS last_value
      |FROM events""".stripMargin

  val userRowSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("last_event_type", StringType),
    StructField("last_value", DoubleType)))

  val userPkSchema: StructType = StructType(Seq(StructField("user_id", LongType)))

  /** Debezium envelope round-trip: typed changelog → envelope JSON
    * (DebeziumEnvelope.encode) → distributed parse back
    * (DebeziumEnvelope.parse) → flat rows. The oracle computes the same
    * rows relationally, so a parse bug (lost op, wrong nesting, driver
    * loop semantics) hash-mismatches.
    */
  def parseEnvelope(spark: SparkSession, dir: String): DataFrame = {
    val ch = CdcOps.cachedChangelog(spark, dir)
    val after = when(col("op") =!= "d",
      struct(col("user_id"), col("last_event_type"), col("last_value"))).otherwise(lit(null))
    val before = when(col("op") === "d",
      struct(col("user_id"), col("last_event_type"), col("last_value"))).otherwise(lit(null))
    val raw = DebeziumEnvelope.encode(ch, Seq("user_id"), col("op"), col("ts_ms"),
      after, before, "users")
    DebeziumEnvelope.parse(raw, userPkSchema, userRowSchema)
      .select(
        col("user_id"), col("op"), col("ts_ms"),
        col("after.last_event_type").as("last_event_type"),
        round(col("after.last_value"), 2).as("last_value"),
        col("src_table"))
      .orderBy("ts_ms", "user_id")
  }

  val parseEnvelopeSql: String =
    s"""WITH ch AS ($changeSql)
       |SELECT user_id, op, ts_ms,
       |  CASE WHEN op = 'd' THEN NULL ELSE last_event_type END AS last_event_type,
       |  CASE WHEN op = 'd' THEN NULL ELSE round(last_value, 2) END AS last_value,
       |  'users' AS src_table
       |FROM ch ORDER BY ts_ms, user_id""".stripMargin

  /** The Avro ingest edge end-to-end: the changelog encoded into
    * Debezium-shaped Avro binaries under the CONFLUENT wire framing
    * (magic byte + schema id — the Schema Registry serializer path),
    * decoded back by [[AvroEnvelope.decode]], and folded to the keyed
    * latest state. Because the codec is lossless over the envelope
    * contract, the wire roundtrip is an identity on the typed change
    * frame — so this entry hash-certifies against the SAME latest-state
    * oracle as the JSON path: any framing slip, schema drift, or field
    * loss anywhere in encode→decode lands on the final state hash.
    * CdcSpec additionally pins decode == DebeziumEnvelope.parse
    * row-for-row (the cross-format equality) and tombstone survival.
    * Cost shape: two per-record projections at the ingest edge (no
    * shuffle) + the one latest-state key fold — what any
    * registry-framed consumer pays.
    */
  def avroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ch = CdcOps.cachedChangelog(spark, dir)
    val after = when(col("op") =!= "d",
      struct(col("user_id"), col("last_event_type"), col("last_value"))).otherwise(lit(null))
    val before = when(col("op") === "d",
      struct(col("user_id"), col("last_event_type"), col("last_value"))).otherwise(lit(null))
    val decoded = AvroEnvelope.decode(
      AvroEnvelope.encode(ch, Seq("user_id"), col("op"), col("ts_ms"),
        after, before, "users", lsnCol = col("seq"), confluentFraming = true),
      userPkSchema, userRowSchema, confluentFraming = true)
    // rebuild the changelog contract from the wire frame (deletes carry
    // their image in `before`, everything else in `after`) and fold
    val chBack = decoded.select(
      col("user_id"), col("op"), col("ts_ms"), col("src_lsn").as("seq"),
      coalesce(col("after.last_event_type"), col("before.last_event_type"))
        .as("last_event_type"),
      coalesce(col("after.last_value"), col("before.last_value")).as("last_value"))
    CdcOps.latestState(chBack, Seq("user_id"), CdcOps.userDataCols)
      .withColumn("last_value", round(col("last_value"), 2))
      .orderBy("user_id")
  }

  /** The roundtrip is a wire-format identity, so the oracle IS the
    * latest-state oracle (a def: `latestStateSql` initializes later in
    * this object).
    */
  def avroRoundtripSql: String = latestStateSql

  /** Snapshot reconstruction — the continuous-upsert end state. Reads
    * the memoized latest-state, so the key aggregation runs once per
    * pass no matter how many entries consume it.
    */
  def latestState(spark: SparkSession, dir: String): DataFrame = {
    CdcOps.cachedLatestState(spark, dir)
      .withColumn("last_value", round(col("last_value"), 2))
      .orderBy("user_id")
  }

  val latestStateSql: String =
    s"""WITH ch AS ($changeSql),
       |r AS (SELECT *,
       |  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, seq DESC) AS rn,
       |  max(ts_ms) OVER (PARTITION BY user_id) AS last_ts_ms,
       |  count(*) OVER (PARTITION BY user_id) AS n_changes
       |  FROM ch)
       |SELECT user_id, last_event_type, round(last_value, 2) AS last_value,
       |       last_ts_ms, n_changes
       |FROM r WHERE rn = 1 AND op <> 'd'
       |ORDER BY user_id""".stripMargin

  /** Order-independent content checksum of the materialized CDC state —
    * the cross-engine validation for [[ParquetUpsertSink.exportSnapshot]]:
    * any engine that can md5 a canonical row string (DuckDB, Trino,
    * another Spark) recomputes the same (n_rows, checksum) over the
    * exported parquet and proves the copy is intact, without comparing
    * rows. The checksum is a SUM of per-row 60-bit md5 prefixes mod a
    * fixed prime, so it is commutative (row order and partitioning
    * can't change it) and MERGEABLE — per-shard checksums of a 100 TB
    * table sum to the table checksum, so validation parallelizes and
    * incremental re-checks only touch changed shards.
    *
    * Doubles are canonicalized as integer cents via
    * `floor(v*100 + 0.5)` on the RAW double — multiply, add and floor
    * are exact IEEE-754 operations every engine evaluates identically,
    * unlike decimal rounding (Spark's round/cast-to-decimal rounds the
    * shortest decimal rendering HALF_UP while DuckDB rounds the binary
    * value, so a halfway value like 2.675 flips between engines).
    * NULLs are encoded explicitly with a \u0001 sentinel — concat_ws
    * silently skips NULL fields, which would canonicalize rows
    * differing only in WHICH field is NULL to the same string. Plan:
    * one map-side projection + a single scalar aggregate; no shuffle
    * beyond the final combine.
    */
  def stateChecksum(spark: SparkSession, dir: String): DataFrame = {
    def c(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      coalesce(x.cast("string"), lit("\u0001"))
    val canon = concat_ws("|",
      c(col("user_id")),
      c(col("last_event_type")),
      c(floor(col("last_value") * lit(100d) + lit(0.5d)).cast("long")),
      c(col("last_ts_ms")),
      c(col("n_changes")))
    CdcOps.cachedLatestState(spark, dir)
      .select(conv(substring(md5(canon.cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("h").cast("decimal(38,0)")) % lit(576460752303423433L).cast("decimal(38,0)"))
          .cast("long").as("checksum"))
  }

  val stateChecksumSql: String =
    s"""WITH ch AS ($changeSql),
       |r AS (SELECT *,
       |  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, seq DESC) AS rn,
       |  max(ts_ms) OVER (PARTITION BY user_id) AS last_ts_ms,
       |  count(*) OVER (PARTITION BY user_id) AS n_changes
       |  FROM ch),
       |state AS (
       |  SELECT user_id, last_event_type, last_value,
       |         last_ts_ms, n_changes
       |  FROM r WHERE rn = 1 AND op <> 'd'),
       |h AS (
       |  SELECT ('0x' || substr(md5(concat_ws('|',
       |    coalesce(CAST(user_id AS VARCHAR), chr(1)),
       |    coalesce(last_event_type, chr(1)),
       |    coalesce(CAST(CAST(floor(last_value * 100 + 0.5) AS BIGINT) AS VARCHAR), chr(1)),
       |    coalesce(CAST(last_ts_ms AS VARCHAR), chr(1)),
       |    coalesce(CAST(n_changes AS VARCHAR), chr(1)))), 1, 15))::BIGINT AS h
       |  FROM state)
       |SELECT count(*) AS n_rows,
       |  CAST(sum(h) % 576460752303423433 AS BIGINT) AS checksum
       |FROM h""".stripMargin

  /** Location of the repo's static dimension file — the counterpart of
    * the reference's `files/staticdata/cities.csv` (email→city)
    * enrichment dim (/root/reference/files/staticdata/cities.csv).
    * Overridable via GRAFT_STATIC_DIM_PATH; otherwise resolved relative
    * to the working directory, so any checkout location (or a cluster
    * submit dir shipping the file) works. The resolved absolute path is
    * interpolated into the oracle SQL below.
    */
  val StaticDimPath: String = {
    val raw = sys.env.getOrElse("GRAFT_STATIC_DIM_PATH", "data/staticdata/event_channels.csv")
    // absolutize bare relative paths only — URI-style values
    // (hdfs://, s3a://, file://) and absolute paths pass through
    // verbatim (java.io.File would mangle a scheme into the cwd)
    if (raw.contains("://") || raw.startsWith("/")) raw
    else new java.io.File(raw).getAbsolutePath
  }

  /** Static-dim enrichment: broadcast a small semicolon-delimited CSV
    * dimension (event_type→channel) into the CDC latest-state and
    * aggregate per channel — the reference's cities.csv pattern
    * re-expressed Spark-first. The dim is read once on the driver-side
    * scan and broadcast; the state never shuffles for the join.
    */
  def enrichedState(spark: SparkSession, dir: String,
                    dimPath: String = StaticDimPath): DataFrame = {
    val dim = broadcast(
      spark.read.option("header", "true").option("delimiter", ";").csv(dimPath))
    latestState(spark, dir)
      .join(dim, col("last_event_type") === col("event_type"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_users"), round(sum("last_value"), 2).as("total_value"))
      .orderBy("channel")
  }

  val enrichedStateSql: String =
    s"""WITH ch AS ($changeSql),
       |r AS (SELECT *,
       |  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, seq DESC) AS rn
       |  FROM ch),
       |state AS (
       |  SELECT user_id, last_event_type, round(last_value, 2) AS last_value
       |  FROM r WHERE rn = 1 AND op <> 'd'),
       |dim AS (SELECT * FROM read_csv('$StaticDimPath', delim=';', header=true))
       |SELECT channel, count(*) AS n_users, round(sum(last_value), 2) AS total_value
       |FROM state JOIN dim ON last_event_type = event_type
       |GROUP BY channel ORDER BY channel""".stripMargin

  /** Initial load (op='r' snapshot semantics): first image per key. */
  def initialSnapshot(spark: SparkSession, dir: String): DataFrame = {
    CdcOps.initialSnapshot(CdcOps.cachedChangelog(spark, dir), Seq("user_id"), CdcOps.userDataCols)
      .withColumnRenamed("last_event_type", "first_event_type")
      .withColumnRenamed("last_value", "first_value")
      .orderBy("user_id")
  }

  val initialSnapshotSql: String =
    s"""WITH ch AS ($changeSql),
       |r AS (SELECT *,
       |  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms ASC, seq ASC) AS rn,
       |  min(ts_ms) OVER (PARTITION BY user_id) AS first_ts_ms
       |  FROM ch)
       |SELECT user_id, 'r' AS op, last_event_type AS first_event_type,
       |       round(last_value, 2) AS first_value, first_ts_ms
       |FROM r WHERE rn = 1
       |ORDER BY user_id""".stripMargin

  /** SCD Type-2 history: the full version trail the continuous upsert
    * path discards — every change opens a version, the next change (or
    * a delete) closes it. The standard "dimension history" consumer of
    * a CDC feed (the reference materializes only the latest image;
    * warehouses typically also want this trail).
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    CdcOps.scd2History(CdcOps.cachedChangelog(spark, dir), Seq("user_id"), CdcOps.userDataCols)
      .withColumn("last_value", round(col("last_value"), 2))
      .orderBy("user_id", "version_no")

  val scd2Sql: String =
    s"""WITH ch AS ($changeSql),
       |v AS (SELECT *,
       |  lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, seq) AS valid_to
       |  FROM ch)
       |SELECT user_id, last_event_type, round(last_value, 2) AS last_value,
       |       ts_ms AS valid_from, valid_to,
       |       CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current,
       |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, seq) AS INT) AS version_no
       |FROM v WHERE op <> 'd'
       |ORDER BY user_id, version_no""".stripMargin

  /** Sequence-gap audit: CDC feeds promise per-key ordered, gapless
    * sequence numbers (LSN/offsets); silent gaps mean lost changes.
    * This flags every key whose consecutive (ts-ordered) changes skip
    * sequence values, with the widest skip — the integrity check a
    * consumer runs before trusting a replayed topic.
    *
    * The synthetic changelog keys sequence by GLOBAL event_id, so
    * per-key gaps are expected here; what the oracle locks is the gap
    * MEASUREMENT. One window shuffle on the key, same partitioning as
    * latestState.
    */
  def gapAudit(spark: SparkSession, dir: String): DataFrame =
    gapAudit(CdcOps.cachedChangelog(spark, dir))

  def gapAudit(changelog: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_ms"), col("seq"))
    changelog
      .withColumn("prev_seq", lag(col("seq"), 1).over(w))
      .filter(col("prev_seq").isNotNull && col("seq") =!= col("prev_seq") + 1)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        max(col("seq") - col("prev_seq") - 1).as("max_gap"),
        min("prev_seq").as("first_gap_after"))
      .orderBy("user_id")
  }

  val gapAuditSql: String =
    s"""WITH ch AS ($changeSql),
       |l AS (SELECT user_id, seq,
       |  lag(seq) OVER (PARTITION BY user_id ORDER BY ts_ms, seq) AS prev_seq
       |  FROM ch)
       |SELECT user_id, count(*) AS n_gaps,
       |  CAST(max(seq - prev_seq - 1) AS BIGINT) AS max_gap,
       |  min(prev_seq) AS first_gap_after
       |FROM l WHERE prev_seq IS NOT NULL AND seq <> prev_seq + 1
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Change accounting per op. */
  def changeCounts(spark: SparkSession, dir: String): DataFrame =
    CdcOps.changeCounts(CdcOps.cachedChangelog(spark, dir), "user_id")

  val changeCountsSql: String =
    s"""WITH ch AS ($changeSql)
       |SELECT op, count(*) AS n, count(DISTINCT user_id) AS n_keys
       |FROM ch GROUP BY op ORDER BY op""".stripMargin

  /** Per-key change-count skew histogram — the state-store sizing
    * evidence a 100 TB CDC deployment reads before provisioning: how
    * hot are keys (count buckets sized to straddle this changelog's
    * per-key distribution: <55 / 55-64 / 65-74 / 75+), and
    * what share of the change volume the hot tail carries. A skewed
    * top bucket is the signal to salt the upsert merge or split the
    * hot keys' state partitions; [[changeCounts]] (per-op volume) and
    * [[gapAudit]] (sequence integrity) don't see key heat at all. One
    * per-key count aggregation (map-side combined) + a bucket rollup
    * over key-count-sized rows; exact integers end-to-end.
    */
  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    val perKey = CdcOps.cachedChangelog(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val bucketMin = when(col("n") < 55, 0)
      .when(col("n") < 65, 55).when(col("n") < 75, 65).otherwise(75)
    perKey
      .withColumn("bucket_min", bucketMin)
      .groupBy("bucket_min")
      .agg(count(lit(1)).as("n_keys"), sum("n").as("n_changes"))
      .crossJoin(broadcast(perKey.agg(sum("n").as("total"))))
      .select(col("bucket_min"),
        when(col("bucket_min") === 0, "<55").when(col("bucket_min") === 55, "55-64")
          .when(col("bucket_min") === 65, "65-74")
          .otherwise("75+").as("bucket"),
        col("n_keys"), col("n_changes"),
        round(col("n_changes").cast("double") / col("total"), 4).as("changes_share"))
      .orderBy("bucket_min")
  }

  val keySkewSql: String =
    s"""WITH ch AS ($changeSql),
       |pk AS (SELECT user_id, count(*) AS n FROM ch GROUP BY user_id),
       |b AS (
       |  SELECT CASE WHEN n < 55 THEN 0 WHEN n < 65 THEN 55 WHEN n < 75 THEN 65
       |              ELSE 75 END AS bucket_min, n
       |  FROM pk),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM pk)
       |SELECT bucket_min,
       |  CASE bucket_min WHEN 0 THEN '<55' WHEN 55 THEN '55-64' WHEN 65 THEN '65-74'
       |       ELSE '75+' END AS bucket,
       |  count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_changes,
       |  round(CAST(sum(n) AS DOUBLE) / t.total, 4) AS changes_share
       |FROM b, t GROUP BY bucket_min, t.total ORDER BY bucket_min""".stripMargin

  /** Per-key change cadence — the state-TTL / watermark sizing metric:
    * for every key, the gaps between consecutive changes (ms), rolled
    * up into count / mean / exact interpolated percentiles / max. A
    * stateful pipeline reads this as "how long after its last change
    * is a key touched again" — p99 bounds how long hot state must stay
    * resident before eviction is safe, and the max bounds the
    * out-of-order horizon a late-data watermark must cover.
    *
    * Scale design: ONE key-partitioned window (lag over (ts_ms, seq) —
    * the same total per-key order every CDC face uses) and one global
    * agg whose percentile is the exact-sort kind; at 100 TB the
    * documented swap is percentile_approx (the t-digest face
    * price_percentiles_approx already certifies the pattern for).
    */
  def changeCadence(spark: SparkSession, dir: String): DataFrame =
    changeCadenceWith(spark, dir, q => expr(s"percentile(gap_ms, $q)"))

  /** [[changeCadence]]'s 100 TB scale twin — the percentile roll-up
    * from the mergeable t-digest (`percentile_approx`), the swap the
    * exact face documents, as code. Keys / gaps / mean / max are exact
    * either way; spec'd ≤ 5% relative on the quantiles. Rows-only.
    */
  def changeCadenceApprox(spark: SparkSession, dir: String): DataFrame =
    // cast: percentile_approx preserves the input's LONG type, but the
    // twin must present the exact face's DOUBLE schema
    changeCadenceWith(spark, dir,
      q => expr(s"percentile_approx(gap_ms, $q, 1000)").cast("double"))

  private def changeCadenceWith(spark: SparkSession, dir: String,
      pct: Double => Column): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "seq")
    CdcOps.cachedChangelog(spark, dir)
      .select(col("user_id"), col("ts_ms"), col("seq"))
      .withColumn("gap_ms", col("ts_ms") - lag("ts_ms", 1).over(w))
      .filter(col("gap_ms").isNotNull)
      .agg(
        countDistinct(col("user_id")).as("n_keys"),
        count(lit(1)).as("n_gaps"),
        round(avg(col("gap_ms")), 4).as("mean_ms"),
        round(pct(0.5), 4).as("p50_ms"),
        round(pct(0.9), 4).as("p90_ms"),
        round(pct(0.99), 4).as("p99_ms"),
        max(col("gap_ms")).as("max_ms"))
  }

  val changeCadenceSql: String =
    s"""WITH ch AS ($changeSql),
       |g AS (
       |  SELECT user_id,
       |    ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, seq) AS gap_ms
       |  FROM ch)
       |SELECT
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
       |  CAST(count(*) AS BIGINT) AS n_gaps,
       |  round(avg(gap_ms), 4) AS mean_ms,
       |  round(quantile_cont(gap_ms, 0.5), 4) AS p50_ms,
       |  round(quantile_cont(gap_ms, 0.9), 4) AS p90_ms,
       |  round(quantile_cont(gap_ms, 0.99), 4) AS p99_ms,
       |  CAST(max(gap_ms) AS BIGINT) AS max_ms
       |FROM g WHERE gap_ms IS NOT NULL""".stripMargin

  /** Batch merge equivalence: state(first half) merged with
    * changes(second half) must equal latest-state over everything —
    * i.e. the foreachBatch upsert path is associative the way Delta
    * merge is. Oracle = the full-range window query.
    */
  def mergeBatch(spark: SparkSession, dir: String): DataFrame = {
    val ch = CdcOps.cachedChangelog(spark, dir)
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    val splitMs = unix_millis(split)
    val base = CdcOps.latestState(ch.filter(col("ts_ms") < splitMs), Seq("user_id"), CdcOps.userDataCols)
      .drop("n_changes")
    val changes = ch.filter(col("ts_ms") >= splitMs)
    CdcOps.mergeChangeSet(base, changes, Seq("user_id"), CdcOps.userDataCols)
      .withColumn("last_value", round(col("last_value"), 2))
      .orderBy("user_id")
  }

  val mergeBatchSql: String =
    s"""WITH ch AS ($changeSql),
       |r AS (SELECT *,
       |  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, seq DESC) AS rn,
       |  max(ts_ms) OVER (PARTITION BY user_id) AS last_ts_ms
       |  FROM ch)
       |SELECT user_id, last_event_type, round(last_value, 2) AS last_value, last_ts_ms
       |FROM r WHERE rn = 1 AND op <> 'd'
       |ORDER BY user_id""".stripMargin

  /** A REAL committed [[ParquetUpsertSink]] state chain, memoized per
    * (session, dir): the four canonical weekly epochs of the user
    * changelog merged through the sink's actual commit protocol
    * (manifest epochs 0–3, all retained) into a tmpdir state store —
    * the substrate that turns the sink's time-travel/CDF faces into
    * driver-checkable entries instead of spec-only ones. Same
    * tmpdir tag + single-writer contract as Layout.bucketedTables;
    * the build cost is attributed as the `cdc_upsert_sink` artifact.
    */
  def cachedUpsertSink(spark: SparkSession, dir: String): ParquetUpsertSink =
    graft.SessionCache.getOrElseUpdate(spark, ("cdcUpsertSink", dir)) {
      val tag = graft.SessionCache.scratchTag(spark, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-cdcsink-$tag"
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.delete(root, true) // stale state from a previous JVM
      val sink = new ParquetUpsertSink(spark, path, Seq("user_id"),
        numBuckets = 16, retainEpochs = 8)
      AggMaintain.tranches(CdcOps.cachedChangelog(spark, dir), AggMaintain.userEpochBounds)
        .zipWithIndex.foreach { case (b, i) => sink.merge(b, i.toLong) }
      sink
    }

  /** Driver face for the change data feed: the keyed diff the sink's
    * [[ParquetUpsertSink.changesBetween]] computes between committed
    * epoch 1 (batches through 2024-01-16) and epoch 3 (all batches) —
    * which keys the last two epochs added, removed, or changed, with
    * after-images. The oracle reconstructs both states relationally
    * from the raw changelog and diffs them, so the whole committed
    * path — bucketed merges, manifest time travel, the diff itself —
    * must agree with the declarative definition row-for-row. Change
    * classification compares RAW values (a rounding collision must not
    * mask a change); rounding is presentation-only.
    */
  def changesBetween(spark: SparkSession, dir: String): DataFrame =
    cachedUpsertSink(spark, dir).changesBetween(1L, 3L)
      .select(col("user_id"), col("change"), col("last_event_type"),
        round(col("last_value"), 2).as("last_value"), col("last_ts_ms"))
      .orderBy("user_id")

  val changesBetweenSql: String =
    s"""WITH ch AS ($changeSql),
       |sb AS (
       |  SELECT user_id, last_event_type, last_value, last_ts_ms FROM (
       |    SELECT user_id, op, last_event_type, last_value,
       |      row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, seq DESC) AS rn,
       |      max(ts_ms) OVER (PARTITION BY user_id) AS last_ts_ms
       |    FROM ch
       |    WHERE ts_ms < CAST(epoch_ms(TIMESTAMP '2024-01-16 00:00:00') AS BIGINT))
       |  WHERE rn = 1 AND op <> 'd'),
       |sa AS (
       |  SELECT user_id, last_event_type, last_value, last_ts_ms FROM (
       |    SELECT user_id, op, last_event_type, last_value,
       |      row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, seq DESC) AS rn,
       |      max(ts_ms) OVER (PARTITION BY user_id) AS last_ts_ms
       |    FROM ch)
       |  WHERE rn = 1 AND op <> 'd'),
       |d AS (
       |  SELECT COALESCE(sa.user_id, sb.user_id) AS user_id,
       |    CASE WHEN sb.user_id IS NULL THEN 'added'
       |         WHEN sa.user_id IS NULL THEN 'removed'
       |         WHEN sa.last_event_type IS DISTINCT FROM sb.last_event_type
       |           OR sa.last_value IS DISTINCT FROM sb.last_value
       |           OR sa.last_ts_ms IS DISTINCT FROM sb.last_ts_ms THEN 'changed'
       |         ELSE 'unchanged' END AS change,
       |    sa.last_event_type AS last_event_type,
       |    round(sa.last_value, 2) AS last_value,
       |    sa.last_ts_ms AS last_ts_ms
       |  FROM sb FULL OUTER JOIN sa ON sb.user_id = sa.user_id)
       |SELECT * FROM d WHERE change <> 'unchanged' ORDER BY user_id""".stripMargin

  /** Driver face for [[ParquetUpsertSink.exportSnapshot]] — the
    * reference's "materialized table is directly queryable by external
    * engines" property, hash-certified: the four-epoch committed sink
    * (the shared `cdc_upsert_sink` artifact) is published as PLAIN
    * parquet + `_SUCCESS`, and the entry returns what an external
    * reader (here: a fresh `spark.read.parquet` with no manifest
    * knowledge; driver-side: DuckDB itself) sees. The oracle
    * reconstructs the latest state relationally from the raw
    * changelog, so bucketed merges → manifest commit → export →
    * plain-directory read must all agree row-for-row.
    */
  def snapshotExport(spark: SparkSession, dir: String): DataFrame = {
    val sink = cachedUpsertSink(spark, dir)
    val tag = graft.SessionCache.scratchTag(spark, dir)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-cdcsnap-$tag"
    sink.exportSnapshot(out)
    val ok = new org.apache.hadoop.fs.Path(s"$out/_SUCCESS")
    require(ok.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(ok),
      s"exportSnapshot published no _SUCCESS completeness marker at $out")
    spark.read.parquet(out)
      .select(col("user_id"), col("last_event_type"),
        round(col("last_value"), 2).as("last_value"), col("last_ts_ms"))
      .orderBy("user_id")
  }

  val snapshotExportSql: String =
    s"""WITH ch AS ($changeSql)
       |SELECT user_id, last_event_type, round(last_value, 2) AS last_value,
       |  last_ts_ms
       |FROM (
       |  SELECT user_id, op, last_event_type, last_value,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, seq DESC) AS rn,
       |    max(ts_ms) OVER (PARTITION BY user_id) AS last_ts_ms
       |  FROM ch)
       |WHERE rn = 1 AND op <> 'd'
       |ORDER BY user_id""".stripMargin

  /** Temporal (as-of) enrichment of the raw activity stream against
    * the SCD2 dimension history: every event is attributed to the
    * dimension VERSION valid at its timestamp — valid_from ≤ t <
    * valid_to, with the delete→re-create gap correctly attributing to
    * no version — then rolled up to the (dimension state × activity
    * type) matrix. The classic warehouse fact-to-dim-history join,
    * here over the engine's own changelog.
    *
    * Plan: NOT a range join. Changes and probe events UNION into one
    * frame and a single user-keyed ordered window carries the last
    * change image forward (`last(..., ignoreNulls)` — the as-of
    * composed discipline), so validity resolution costs ONE
    * event-volume shuffle, no join, no interval explosion; a change
    * sorts before its own-instant probes (src 0 < 1 at equal (ts_ms,
    * seq)), which is exactly the valid_from ≤ t closed bound. Deletes
    * ride the same carried image (op = 'd' ⇒ no version) instead of
    * needing an anti-join. The rollup partials map-side into a
    * ≤(|states|+1)·|types| matrix.
    */
  def scd2AsofActivity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = CdcOps.cachedChangelog(spark, dir)
      .select(col("user_id"), col("ts_ms"), col("seq"), lit(0).as("src"),
        struct(col("op"), col("last_event_type").as("attr")).as("chg"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("double").as("value"))
    val pr = graft.Tables.events(spark, dir)
      .select(col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("event_id").as("seq"), lit(1).as("src"),
        lit(null).cast("struct<op:string,attr:string>").as("chg"),
        col("event_type"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ms"), col("seq"), col("src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ch.unionByName(pr)
      .withColumn("dim", last(col("chg"), ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      .select(coalesce(when(col("dim.op") =!= "d", col("dim.attr")), lit("none"))
        .as("dim_state"), col("event_type"), col("value"))
      .groupBy("dim_state", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("dim_state", "event_type")
  }

  val scd2AsofActivitySql: String =
    s"""WITH ch AS ($changeSql),
       |pr AS (
       |  SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_id AS seq,
       |    event_type, value
       |  FROM events),
       |u AS (
       |  SELECT user_id, ts_ms, seq, 0 AS src, op, last_event_type AS attr,
       |    CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS DOUBLE) AS value
       |  FROM ch
       |  UNION ALL
       |  SELECT user_id, ts_ms, seq, 1, NULL, NULL, event_type, value FROM pr),
       |st AS (
       |  SELECT *, last_value(CASE WHEN src = 0 THEN struct_pack(op := op, attr := attr) END
       |      IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY ts_ms, seq, src
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dim
       |  FROM u)
       |SELECT coalesce(CASE WHEN dim.op <> 'd' THEN dim.attr END, 'none') AS dim_state,
       |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
       |FROM st WHERE src = 1
       |GROUP BY 1, 2 ORDER BY dim_state, event_type""".stripMargin
}
