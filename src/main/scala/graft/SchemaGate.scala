package graft

import org.apache.spark.sql.SparkSession

/** Fail-fast testdata schema gate.
  *
  * The driver regenerates `/root/testdata` between rounds, and a layout
  * drift (round 8: `events.ts` TIMESTAMP(NANOS) → timestamp[us]) used to
  * surface as dozens of opaque per-query AnalysisExceptions. This probe
  * reads every table's parquet footer up front and reports one named
  * `(table, column, expected, actual)` diff line per drift, so a future
  * regeneration produces a single diagnostic instead of 41 failures.
  *
  * Allowed-type sets (not single types) encode the layouts the loaders
  * genuinely handle: `Tables.events` adapts ts across nanos-as-long /
  * TIMESTAMP_NTZ / timestamp, and the date-ish TPC-H columns have shipped
  * as both date and µs timestamp.
  */
object SchemaGate {

  private val I = Set("int")
  private val L = Set("bigint")
  private val D = Set("double")
  private val S = Set("string")
  // date-ish columns: generator has emitted plain DATE and µs timestamps
  private val dateLike = Set("date", "timestamp", "timestamp_ntz")
  // events.ts variants Tables.events adapts to (bigint = NANOS read under
  // spark.sql.legacy.parquet.nanosAsLong=true)
  private val tsLike = Set("bigint", "timestamp", "timestamp_ntz")

  /** table -> (column -> allowed catalogStrings); order-insensitive. */
  val expected: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq("r_regionkey" -> I, "r_name" -> S),
    "nation" -> Seq("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I),
    "customer" -> Seq("c_custkey" -> L, "c_name" -> S, "c_nationkey" -> I,
      "c_acctbal" -> D, "c_mktsegment" -> S),
    "supplier" -> Seq("s_suppkey" -> L, "s_name" -> S, "s_nationkey" -> I,
      "s_acctbal" -> D),
    "part" -> Seq("p_partkey" -> L, "p_name" -> S, "p_brand" -> S,
      "p_type" -> S, "p_size" -> I, "p_retailprice" -> D),
    "orders" -> Seq("o_orderkey" -> L, "o_custkey" -> L, "o_orderstatus" -> S,
      "o_totalprice" -> D, "o_orderdate" -> dateLike, "o_orderpriority" -> S),
    "lineitem" -> Seq("l_orderkey" -> L, "l_partkey" -> L, "l_suppkey" -> L,
      "l_linenumber" -> I, "l_quantity" -> D, "l_extendedprice" -> D,
      "l_discount" -> D, "l_tax" -> D, "l_returnflag" -> S,
      "l_linestatus" -> S, "l_shipdate" -> dateLike),
    "events" -> Seq("event_id" -> L, "ts" -> tsLike, "user_id" -> L,
      "event_type" -> S, "value" -> D, "props" -> S),
    "documents" -> Seq("doc_id" -> L, "text" -> S, "lang" -> S,
      "source" -> S, "n_chars" -> L),
    "embeddings" -> Seq("vec_id" -> L, "embedding" -> Set("array<float>"),
      "label" -> I))

  /** One line per drift; empty means the layout matches what the loaders
    * handle. Never throws — unreadable tables become diff lines too.
    */
  def diffs(spark: SparkSession, dir: String): Seq[String] = {
    // so a NANOS events file surfaces as bigint instead of a read error;
    // restored after the probe — a read-only gate must not leak a
    // legacy-decode conf into the rest of the session
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val nanosPrev = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    try expected.flatMap { case (table, cols) =>
      val read =
        try Right(spark.read.parquet(s"$dir/$table.parquet").schema)
        catch {
          case scala.util.control.NonFatal(e) =>
            Left(e.toString.linesIterator.next())
        }
      read match {
        case Left(err) => Seq(s"$table: UNREADABLE: $err")
        case Right(schema) =>
          val actual = schema.fields
            .map(f => f.name -> f.dataType.catalogString).toMap
          val known = cols.map(_._1).toSet
          val missing = cols.collect { case (c, want) if !actual.contains(c) =>
            s"$table.$c: MISSING (expected one of ${want.mkString("{", ", ", "}")})"
          }
          val wrong = cols.collect {
            case (c, want) if actual.get(c).exists(t => !want(t)) =>
              s"$table.$c: expected one of ${want.mkString("{", ", ", "}")}, actual ${actual(c)}"
          }
          val extra = schema.fields.map(_.name).filterNot(known)
            .map(c => s"$table.$c: UNEXPECTED new column (${actual(c)})")
          missing ++ wrong ++ extra
      }
    } finally nanosPrev match {
      case Some(v) => spark.conf.set(nanosKey, v)
      case None    => spark.conf.unset(nanosKey)
    }
  }

  /** Gate entry for the CLI mains: print every diff line and throw once
    * with the full summary, before any query runs.
    */
  def assertClean(spark: SparkSession, dir: String): Unit = {
    val d = diffs(spark, dir)
    if (d.nonEmpty) {
      d.foreach(l => System.err.println(s"[schema-gate] $l"))
      throw new IllegalStateException(
        s"testdata schema drift in $dir (${d.size} diffs):\n  " +
          d.mkString("\n  "))
    }
  }
}
