package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One keyed operator query from SURVEY.md §2.
  *
  * `key` is the stable inventory key; `oracle` is the equivalent DuckDB
  * ANSI SQL (None for non-SQL-expressible ops — those get a rows-only
  * check from the driver plus a scalatest spec here).
  */
final case class Q(key: String, oracle: Option[String], run: (SparkSession, String) => DataFrame)

object Q {
  def apply(key: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(key, Some(oracle), run)
  def smoke(key: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(key, None, run)
}

/** Determinism helpers (SURVEY.md §7.3 oracle-determinism rules).
  *
  * Double summation order differs between Spark and DuckDB (and between
  * partitionings at scale), so any rounded double aggregate can flip a
  * rounding boundary. All money/quantity aggregates therefore run in
  * exact DECIMAL(18,2) arithmetic and convert back to double at the end
  * — order-independent, so also stable under repartitioning at 100 TB.
  */
object Det {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact sum of a 2-decimal-valued double column, as double. */
  def dsum(c: Column): Column = round(sum(dec2(c)).cast("double"), 2)

  /** Exact-sum-based average rounded to 4 decimals. */
  def davg(c: Column): Column = round(sum(dec2(c)).cast("double") / count(c), 4)

  /** DuckDB SQL fragments mirroring the above. */
  def sqlDsum(x: String): String = s"round(CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE), 2)"
  def sqlDavg(x: String): String = s"round(CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / count($x), 4)"
}

/** Size-gated broadcast (SURVEY §4 / VERDICT r2 item 7).
  *
  * Several pipeline operators join a corpus-derived side table (per-doc
  * gram sets, the token dictionary) that is broadcastable at any tested
  * scale but corpus-proportional in the limit — at raw-web 100 TB it can
  * exceed any broadcast budget. `bcast` keeps the broadcast plan while
  * Catalyst's size estimate (driver-side metadata, no job) stays under a
  * configurable budget, and silently degrades to a shuffle join (one
  * extra exchange, identical result) above it.
  */
object Gate {
  def bcast(df: DataFrame): DataFrame = {
    val budget = df.sparkSession.conf.getOption("spark.sql.graft.broadcastGateBytes")
      .map(_.toLong).getOrElse(256L << 20)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= budget)
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }
}

/** Per-(JVM, dataset) scratch roots for layout operators (lake_compact,
  * osm_region_partition_write). A fixed java.io.tmpdir path races when a
  * bench and a test run share one box; the per-process nonce isolates
  * runs while the operator and its spec — same JVM — still agree on the
  * path, and the dataset hash keeps two data dirs apart within a run.
  */
object Scratch {
  private val runNonce = java.lang.Long.toHexString(
    java.util.concurrent.ThreadLocalRandom.current().nextLong())

  private def rmTree(root: java.io.File): Unit = {
    val kids = root.listFiles()
    if (kids != null) kids.foreach(rmTree)
    root.delete()
  }

  // Leak control (ADVICE r11): without cleanup every bench/verify/test
  // run leaves full fact-table copies under java.io.tmpdir. Own dirs go
  // at JVM exit; dirs from DEAD runs (crashed JVMs never reach their
  // hook) are swept once at startup — but only when stale by mtime, so
  // a concurrently running bench/test on the same box is never touched.
  private val staleMs = 6L * 3600 * 1000
  locally {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val old = tmp.listFiles()
    if (old != null) old.filter(f => f.isDirectory && f.getName.startsWith("graft_")
        && System.currentTimeMillis() - f.lastModified() > staleMs)
      .foreach(rmTree)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val now = tmp.listFiles()
      if (now != null) now.filter(f => f.isDirectory
          && f.getName.contains(s"_${runNonce}_")).foreach(rmTree)
    }))
  }

  def dir(tag: String, d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${tag}_${runNonce}_${math.abs(d.hashCode).toHexString}"

  /** Conf-keyed ONE-TIME layout build (ADVICE r16 scan_dpp hygiene): the
    * session conf is the per-(session, dataset) memo, but two threads
    * hitting the same un-built key would both run `build` and race the
    * write — the whole check-build-set sequence is serialized here. Use
    * with a [[dir]]-rooted path so the layout is swept at JVM exit
    * instead of leaking under java.io.tmpdir.
    */
  def onceConf(s: org.apache.spark.sql.SparkSession, confKey: String)
              (build: => String): String = synchronized {
    s.conf.getOption(confKey).getOrElse {
      val root = build
      s.conf.set(confKey, root)
      root
    }
  }
}

/** Registry for plans an operator persists as part of its own shape
  * (text_tfidf_topk's tf table): callers that sweep many queries
  * (Verify, Bench, specs) drain it after materializing each result so
  * executor storage memory doesn't accumulate across the sweep.
  */
object Caches {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  // Bounded (ADVICE r11): a long-lived session that never calls drain()
  // must not grow the registry without limit — past the cap the OLDEST
  // entry is unpersisted and dropped (storage freed AND the plan object
  // released; sweeping callers still drain to zero between queries).
  private val cap = 32
  def register[A <: Dataset[_]](df: A): A = synchronized {
    while (live.length >= cap) live.remove(0).unpersist()
    live += df.toDF(); df
  }
  def drain(): Unit = synchronized { live.foreach(_.unpersist()); live.clear() }
}

/** Table loaders over the driver-generated corpus (TESTDATA.md). */
object T {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)     = apply(s, d, "region")
  def nation(s: SparkSession, d: String)     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String)   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String)   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String)       = apply(s, d, "part")
  def orders(s: SparkSession, d: String)     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String)   = apply(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    * reader rejects outright — read as nanos-long and downcast) and as
    * TIMESTAMP(MICROS) without zone info (which Spark reads as
    * TIMESTAMP_NTZ — cast to the session-zone instant; sessions here pin
    * UTC, so the wall-clock values are unchanged and unix_millis/window
    * functions work). [[normalizeEventTs]] handles both plus the
    * already-normalized case, schema-driven, so the loader keeps working
    * whichever physical type a fixture generation used.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(apply(s, d, "events"))
  }

  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw // already session-zoned micros
    }
  }
  def documents(s: SparkSession, d: String)  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = apply(s, d, "embeddings")
}
