package graft

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.SchemaOps

/** The query inventory behind `SparkEntry.queries` / `oracleSql`
  * (SURVEY §7.1 `graft.Queries`). Each entry is a named operator
  * demonstration over the driver's read-only parquet testdata; each
  * SQL-expressible one carries a DuckDB oracle with IDENTICAL column
  * names and deterministic ordering.
  *
  * Numeric discipline for oracle parity: aggregates over doubles are
  * computed in exact decimal arithmetic on both sides and cast to double
  * at the end — decimal sums are order-independent and engine-exact, so
  * Spark and DuckDB produce bit-identical doubles. Timestamp discipline:
  * `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it via
  * `Tables.events` (truncating ns→µs), so every events oracle wraps the
  * column in `CAST(ts AS TIMESTAMP)` to apply the same truncation in
  * DuckDB.
  */
object Queries {

  /** Fixed ingestion clock (SURVEY §7.4 risk 3: the reference stamps
    * driver-side `now()`; determinism requires an injected instant).
    */
  val FixedClock: Instant = Instant.parse("2026-01-01T00:00:00Z")

  /** One registry row: name, Spark query, optional DuckDB oracle. */
  final case class QueryDef(
      name: String,
      query: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

  /** Decimal-exact sum of a double column, returned as double. */
  private def dsum(c: Column, dt: String = "decimal(12,2)"): Column =
    sum(c.cast(dt)).cast("double")

  // =====================================================================
  // Schema-op parity queries (SURVEY §2 C/D/E/I operators over testdata)
  // =====================================================================

  private val schemaOpQueries: Seq[QueryDef] = Seq(
    QueryDef("c1_normalize_names",
      (s, dir) => {
        // messy source names (the generator's style) -> normalized
        val messy = t(s, dir, "events")
          .toDF("Event ID", "TS", "User-ID", "Event Type", "Value", "Props(raw)")
        SchemaOps.normalizeNames(messy)
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      },
      Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
             |       event_type, value, props
             |FROM events""".stripMargin)),

    QueryDef("c2_stamp_created_at",
      (s, dir) => SchemaOps.stampCreatedAt(t(s, dir, "events"), FixedClock),
      Some("""SELECT TIMESTAMP '2026-01-01 00:00:00' AS created_at,
             |       event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
             |       event_type, value, props
             |FROM events""".stripMargin)),

    QueryDef("c5_null_defaults",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val a = ev.select(col("event_id"), col("event_type"))
        val b = ev.select(col("event_id"), col("user_id"))
        SchemaOps.withDefaults(SchemaOps.unionByNameAll(Seq(a, b)))
      },
      Some("""SELECT event_id, event_type, CAST(0 AS BIGINT) AS user_id FROM events
             |UNION ALL
             |SELECT event_id, 'Unknown', user_id FROM events""".stripMargin)),

    QueryDef("c6_cast_types",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_shipdate"))
        SchemaOps.castTo(li, StructType(Seq(
          StructField("l_linenumber", LongType),
          StructField("l_shipdate", DateType))))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |       l_quantity, CAST(l_shipdate AS DATE) AS l_shipdate
             |FROM lineitem""".stripMargin)),

    QueryDef("c7_dates_to_timestamps",
      (s, dir) => {
        val withDate = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_day"))
        SchemaOps.datesToTimestamps(withDate)
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_day
             |FROM lineitem""".stripMargin)),

    QueryDef("d1_union_by_name",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val a = ev.select(col("event_id"), col("user_id"), col("event_type"))
        val b = ev.select(col("event_id"), col("value"))
        SchemaOps.unionByNameAll(Seq(a, b))
      },
      Some("""SELECT event_id, user_id, event_type, CAST(NULL AS DOUBLE) AS value
             |FROM events
             |UNION ALL
             |SELECT event_id, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), value
             |FROM events""".stripMargin)),

    QueryDef("e1_align_schema",
      (s, dir) => SchemaOps.alignTo(t(s, dir, "documents"), StructType(Seq(
        StructField("doc_id", LongType),
        StructField("lang", StringType),
        StructField("n_chars", IntegerType),       // cast bigint -> int
        StructField("quality", DoubleType)))),     // missing -> typed null
      Some("""SELECT doc_id, lang, CAST(n_chars AS INTEGER) AS n_chars,
             |       CAST(NULL AS DOUBLE) AS quality, text, source
             |FROM documents""".stripMargin)),

    QueryDef("e4_conform_order",
      (s, dir) => SchemaOps.conformOrder(t(s, dir, "documents"), StructType(Seq(
        StructField("source", StringType),
        StructField("doc_id", LongType),
        StructField("review_flag", BooleanType)))), // missing -> null, no casts
      Some("""SELECT source, doc_id, CAST(NULL AS BOOLEAN) AS review_flag,
             |       text, lang, n_chars
             |FROM documents""".stripMargin)),

    QueryDef("i2_text_normalize",
      (s, dir) => t(s, dir, "documents").select(col("doc_id"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("text_norm")),
      Some("""SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS text_norm
             |FROM documents""".stripMargin))
  )

  // =====================================================================
  // General query surface (TPC-H-shaped demonstrations; SURVEY §2
  // "absent operator classes" — joins/aggs/windows/sorts our engine adds)
  // =====================================================================

  private val tpchQueries: Seq[QueryDef] = Seq(
    QueryDef("q1_agg",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(12,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("q2_filter_pushdown",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM lineitem
             |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'""".stripMargin)),

    QueryDef("q3_top_revenue_orders",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        // dims are tiny relative to lineitem at every SF: broadcast both
        l.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(12,2)")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    QueryDef("q5_region_revenue",
      (s, dir) => {
        val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
            col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        val l = t(s, dir, "lineitem")
        val sup = t(s, dir, "supplier")
        // star-join: every dim broadcast, lineitem streams through once
        l.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(12,2)")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    QueryDef("q_window_rank",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          // cast: DuckDB's ROW_NUMBER is bigint, Spark's is int
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) ranked
             |WHERE rn <= 3""".stripMargin)),

    QueryDef("q_topk_orders",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(20),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 20""".stripMargin)),

    QueryDef("q_semi_join",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        t(s, dir, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin)),

    QueryDef("q_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin)),

    QueryDef("q_distinct_agg",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_supp").desc, col("l_partkey"))
        .limit(15),
      Some("""SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_supp,
             |       COUNT(*) AS n_lines
             |FROM lineitem
             |GROUP BY l_partkey
             |ORDER BY n_supp DESC, l_partkey
             |LIMIT 15""".stripMargin)),

    QueryDef("q_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    QueryDef("q_events_hourly",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(10,2)")).cast("double").as("sum_value")),
      Some("""SELECT event_type,
             |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))""".stripMargin))
  )

  // =====================================================================
  // Text-analysis extension queries (documents table; graft.functions
  // .TextFunctions — LLM-pipeline surface, SURVEY §7.3)
  // =====================================================================

  private val textQueries: Seq[QueryDef] = {
    import graft.functions.TextFunctions._
    Seq(
      QueryDef("text_token_count",
        (s, dir) => t(s, dir, "documents").select(col("doc_id"),
          wsTokenCount(col("text")).as("n_ws_tokens"),
          bpeishTokenCount(col("text")).as("n_bpe_tokens")),
        Some("""SELECT doc_id,
               |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
               |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
               |FROM documents""".stripMargin)),

      QueryDef("text_langid",
        (s, dir) => t(s, dir, "documents").select(col("doc_id"),
          langId(col("text")).as("lang_pred")),
        Some("""WITH pad AS (
               |  SELECT doc_id,
               |    ' ' || trim(regexp_replace(lower(text), '\s+', ' ', 'g')) || ' ' AS p
               |  FROM documents
               |), s AS (
               |  SELECT doc_id,
               |    CAST(contains(p, ' the ') AS INTEGER) + CAST(contains(p, ' a ') AS INTEGER)
               |      + CAST(contains(p, ' of ') AS INTEGER) + CAST(contains(p, ' and ') AS INTEGER)
               |      + CAST(contains(p, ' is ') AS INTEGER) AS s_en,
               |    CAST(contains(p, ' el ') AS INTEGER) + CAST(contains(p, ' la ') AS INTEGER)
               |      + CAST(contains(p, ' de ') AS INTEGER) + CAST(contains(p, ' que ') AS INTEGER)
               |      + CAST(contains(p, ' y ') AS INTEGER) AS s_es,
               |    CAST(contains(p, ' der ') AS INTEGER) + CAST(contains(p, ' die ') AS INTEGER)
               |      + CAST(contains(p, ' das ') AS INTEGER) + CAST(contains(p, ' und ') AS INTEGER)
               |      + CAST(contains(p, ' ist ') AS INTEGER) AS s_de,
               |    CAST(contains(p, ' le ') AS INTEGER) + CAST(contains(p, ' la ') AS INTEGER)
               |      + CAST(contains(p, ' les ') AS INTEGER) + CAST(contains(p, ' et ') AS INTEGER)
               |      + CAST(contains(p, ' est ') AS INTEGER) AS s_fr,
               |    CAST(contains(p, '的') AS INTEGER) + CAST(contains(p, '是') AS INTEGER)
               |      + CAST(contains(p, '了') AS INTEGER) AS s_zh
               |  FROM pad
               |)
               |SELECT doc_id,
               |  CASE
               |    WHEN s_en = GREATEST(s_en, s_es, s_de, s_fr, s_zh) AND s_en > 0 THEN 'en'
               |    WHEN s_es = GREATEST(s_en, s_es, s_de, s_fr, s_zh) AND s_es > 0 THEN 'es'
               |    WHEN s_de = GREATEST(s_en, s_es, s_de, s_fr, s_zh) AND s_de > 0 THEN 'de'
               |    WHEN s_fr = GREATEST(s_en, s_es, s_de, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
               |    WHEN s_zh = GREATEST(s_en, s_es, s_de, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
               |    ELSE 'und'
               |  END AS lang_pred
               |FROM s""".stripMargin)),

      QueryDef("text_quality",
        (s, dir) => t(s, dir, "documents").select(col("doc_id"),
          wsTokenCount(col("text")).as("n_ws_tokens"),
          punctCount(col("text")).as("n_punct"),
          stopwordCount(col("text")).as("n_stop"),
          qualityScore(col("text")).as("quality")),
        Some("""WITH m AS (
               |  SELECT doc_id,
               |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
               |    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
               |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               |         tok -> tok IN ('the','a','of','and','is'))) AS BIGINT) AS n_stop,
               |    length(text) AS n_len
               |  FROM documents
               |)
               |SELECT doc_id, n_ws_tokens, n_punct, n_stop,
               |  LEAST(CAST(n_ws_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
               |  + (1.0 - LEAST(CAST(n_punct AS DOUBLE) / CAST(n_len AS DOUBLE) * 5.0, 1.0)) * 0.3
               |  + (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_ws_tokens AS DOUBLE)) * 0.3 AS quality
               |FROM m""".stripMargin)),

      QueryDef("text_fingerprint",
        (s, dir) => t(s, dir, "documents").select(col("doc_id"),
          fingerprintExact(col("text")).as("fp_exact"),
          fingerprintKey(col("text")).as("fp_key")),
        Some("""SELECT doc_id,
               |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_exact,
               |  md5(array_to_string(list_sort(list_distinct(
               |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))), ' ')) AS fp_key
               |FROM documents""".stripMargin))
    )
  }

  // =====================================================================
  // Deduplication extension queries (documents/embeddings tables;
  // graft.operators.Dedup / Similarity — SURVEY §7.3). The corpus for
  // the near-dup demos is documents ∪ deterministic mutants (ids offset
  // by 100000) so duplicates provably exist at every SF; the approximate
  // families (MinHash/SimHash/LSH) are rows-only checked, exact dedup
  // and brute-force cosine carry full oracles.
  // =====================================================================

  /** documents ∪ exact copies of every 7th doc (id+100000). */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 100000))
  }

  /** documents ∪ near-dup mutants (3 tokens appended) of every 10th doc. */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" graft dup marker"))))
  }

  /** embeddings ∪ perturbed mutants (±0.01 alternating) of every 10th. */
  private def nearDupVectors(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, d) => (x + when(d % 2 === 0, lit(0.01f)).otherwise(lit(-0.01f)))
            .cast("float"))))
  }

  private val dedupQueries: Seq[QueryDef] = {
    import graft.operators.{Dedup, Similarity}
    Seq(
      QueryDef("dedup_exact",
        (s, dir) => Dedup.exact(dupCorpus(s, dir)),
        Some("""WITH corpus AS (
               |  SELECT doc_id, text FROM documents
               |  UNION ALL
               |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
               |)
               |SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               |       MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
               |FROM corpus
               |GROUP BY 1""".stripMargin)),

      QueryDef("dedup_minhash",
        (s, dir) => Dedup.minhashPairs(nearDupCorpus(s, dir),
          shingleLen = 3, k = 64, bands = 16, threshold = 0.6),
        None),

      QueryDef("dedup_simhash",
        (s, dir) => Dedup.simhashPairs(nearDupCorpus(s, dir), maxHamming = 8),
        None),

      QueryDef("dedup_ngram",
        (s, dir) => Dedup.ngramJaccardPairs(nearDupCorpus(s, dir),
          shingleLen = 3, threshold = 0.5, maxDocFreq = 50),
        None),

      QueryDef("dedup_embedding",
        (s, dir) => Similarity.embeddingNearDupPairs(nearDupVectors(s, dir),
          threshold = 0.995),
        None)
    )
  }

  // =====================================================================
  // Similarity-search extension queries
  // =====================================================================

  private val simQueries: Seq[QueryDef] = {
    import graft.operators.Similarity
    Seq(
      QueryDef("sim_topk_bruteforce",
        (s, dir) => {
          val emb = t(s, dir, "embeddings")
          Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        },
        // exact mirror of the Spark fold: sequential left-fold with
        // double widening -> bit-identical sims -> identical ranking
        Some("""WITH pairs AS (
               |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
               |      s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)),
               |      (acc, x) -> acc + x) AS dot_qn,
               |    sqrt(list_reduce(list_transform(q.embedding,
               |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nq,
               |    sqrt(list_reduce(list_transform(c.embedding,
               |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nc
               |  FROM embeddings q, embeddings c
               |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
               |), sims AS (
               |  SELECT q_id, n_id, dot_qn / (nq * nc) AS sim,
               |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               |      ORDER BY dot_qn / (nq * nc) DESC, n_id) AS BIGINT) AS rank
               |  FROM pairs
               |)
               |SELECT q_id, n_id, sim, rank FROM sims WHERE rank <= 10""".stripMargin)),

      QueryDef("sim_topk_lsh",
        (s, dir) => {
          val emb = t(s, dir, "embeddings")
          Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        },
        None)
    )
  }

  // =====================================================================
  // Multimodal extension queries (binary payload plumbing over a media
  // table derived from documents; decode is stubbed — Multimodal.scala)
  // =====================================================================

  private val multimodalQueries: Seq[QueryDef] = {
    import graft.operators.Multimodal
    Seq(
      QueryDef("mm_checksums",
        (s, dir) => Multimodal.checksums(
          Multimodal.mediaFromDocuments(t(s, dir, "documents"))),
        Some("""SELECT doc_id AS media_id,
               |  CASE CAST(doc_id % 3 AS INTEGER)
               |    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
               |  END AS kind,
               |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               |  sha256(text) AS sha256
               |FROM documents""".stripMargin)),

      QueryDef("mm_frame_sample",
        (s, dir) => Multimodal.sampleFrames(
          Multimodal.mediaFromDocuments(t(s, dir, "documents")),
          frameLen = 64, stride = 32),
        None)
    )
  }

  // =====================================================================
  // Registry
  // =====================================================================

  val registry: Seq[QueryDef] =
    schemaOpQueries ++ tpchQueries ++ textQueries ++ dedupQueries ++
      simQueries ++ multimodalQueries

  /** name → ((spark, sfDir) => result). */
  def all: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.query).toMap

  /** name → DuckDB oracle SQL; keys ⊆ all.keys. */
  def oracles: Map[String, String] =
    registry.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
