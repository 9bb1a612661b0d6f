package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.H — scalar function families.
  *
  * Reference evidence: tag normalization and typed-column promotion in the
  * flex styles (`/root/reference/README.md:93`); snapshot-date math
  * (`/root/reference/osm_etl.py:13,45`). Everything here is a built-in
  * `functions._` call — codegen'd, no UDFs — so the whole projection stays
  * inside one WholeStageCodegen span over the scan.
  *
  * Oracle dialect notes (SURVEY.md §7.3): DuckDB `log` is log10 (use `ln`),
  * `dayofweek` is 0=Sunday vs Spark's 1=Sunday (normalize to 0-based),
  * `regexp_replace` needs the 'g' flag, and engine-specific `hash` is
  * avoided in favor of md5/sha256.
  */
object Scalars {

  val all: Seq[Q] = Seq(
    Q(
      "fn_string",
      """SELECT p_partkey,
        |       p_brand || '/' || p_type            AS brand_type,
        |       lower(p_name)                       AS name_lc,
        |       upper(p_brand)                      AS brand_uc,
        |       substring(p_name, 1, 8)             AS name_prefix,
        |       length(p_name)                      AS name_len,
        |       len(string_split(p_name, ' '))      AS n_words,
        |       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
        |       replace(p_type, ' ', '_')           AS type_snake,
        |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |       trim(' ' || p_brand || ' ')         AS brand_trimmed
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      T.part(s, d).select(
        col("p_partkey"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        lower(col("p_name")).as("name_lc"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowels"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        trim(concat(lit(" "), col("p_brand"), lit(" "))).as("brand_trimmed")
      ).orderBy(col("p_partkey"))
    },

    Q(
      "fn_date",
      """SELECT o_orderkey,
        |       year(o_orderdate)                       AS order_year,
        |       month(o_orderdate)                      AS order_month,
        |       dayofweek(o_orderdate)                  AS order_dow,
        |       date_trunc('month', o_orderdate)        AS order_month_start,
        |       datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
        |       CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
        |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
        |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      T.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        // Spark dayofweek is 1=Sunday; DuckDB's is 0=Sunday → normalize.
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("order_dow"),
        date_trunc("month", col("o_orderdate")).as("order_month_start"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_eoy"),
        date_add(col("o_orderdate").cast("date"), 30).cast("string").as("due_date"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"),
        to_date(col("o_orderdate")).cast("string").as("order_date")
      ).orderBy(col("o_orderkey"))
    },

    Q(
      "fn_math",
      """SELECT p_partkey,
        |       round(p_retailprice, 1)                  AS price_r1,
        |       abs(p_retailprice - 1000.0)              AS dist_1000,
        |       CAST(ceil(p_retailprice) AS BIGINT)      AS price_ceil,
        |       CAST(floor(p_retailprice) AS BIGINT)     AS price_floor,
        |       round(sqrt(p_retailprice), 6)            AS price_sqrt,
        |       round(ln(p_retailprice), 6)              AS price_ln,
        |       round(pow(CAST(p_size AS DOUBLE), 2), 1) AS size_sq,
        |       round(exp(CAST(p_size AS DOUBLE) / 50.0), 6) AS size_exp,
        |       p_partkey % 7                            AS key_mod7,
        |       CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS price_side
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      T.part(s, d).select(
        col("p_partkey"),
        round(col("p_retailprice"), 1).as("price_r1"),
        abs(col("p_retailprice") - 1000.0).as("dist_1000"),
        ceil(col("p_retailprice")).as("price_ceil"),
        floor(col("p_retailprice")).as("price_floor"),
        round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
        round(log(col("p_retailprice")), 6).as("price_ln"),
        round(pow(col("p_size").cast("double"), 2), 1).as("size_sq"),
        round(exp(col("p_size").cast("double") / 50.0), 6).as("size_exp"),
        pmod(col("p_partkey"), lit(7)).as("key_mod7"),
        signum(col("p_retailprice") - 1000.0).as("price_side")
      ).orderBy(col("p_partkey"))
    },

    Q(
      "fn_cond",
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN 'debt'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END                      AS bal_class,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
        |       least(c_acctbal, 1000.0)                  AS bal_capped,
        |       greatest(c_acctbal, 0.0)                  AS bal_floor0
        |FROM customer
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      // flex-style classification: highway tag → road class becomes
      // CASE WHEN over a typed column (README.md:93).
      T.customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_class"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg_or_other"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_capped"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0")
      ).orderBy(col("c_custkey"))
    },

    Q(
      "fn_array",
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |         list(l_partkey ORDER BY l_linenumber, l_partkey) AS parts,
        |         list(l_quantity ORDER BY l_linenumber, l_partkey) AS qtys
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |       len(parts)                                    AS n_items,
        |       array_to_string(list_slice(parts, 1, 3), ',') AS first3,
        |       len(list_distinct(parts))                     AS n_distinct_parts,
        |       list_contains(parts, 1)                       AS has_part1,
        |       CAST(list_sum(qtys) AS DOUBLE)                AS total_qty,
        |       array_to_string(list_sort(list_transform(list_distinct(parts), x -> x % 100)), ',') AS part_suffixes
        |FROM per_order
        |ORDER BY l_orderkey""".stripMargin
    ) { (s, d) =>
      // Way-shaped array workload (README.md:80-81): ordered member list per
      // entity, then higher-order functions — all codegen-friendly builtins,
      // no UDF. aggregate() here is the map-side fold a custom geometry
      // kernel would use.
      T.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(
          expr("transform(array_sort(collect_list(struct(l_linenumber, l_partkey))), x -> x.l_partkey)").as("parts"),
          expr("transform(array_sort(collect_list(struct(l_linenumber, l_partkey, l_quantity))), x -> x.l_quantity)").as("qtys"))
        .select(
          col("l_orderkey"),
          size(col("parts")).cast("long").as("n_items"),
          array_join(expr("slice(parts, 1, 3)"), ",").as("first3"),
          size(array_distinct(col("parts"))).cast("long").as("n_distinct_parts"),
          array_contains(col("parts"), 1L).as("has_part1"),
          expr("aggregate(qtys, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("total_qty"),
          array_join(sort_array(expr("transform(array_distinct(parts), x -> x % 100)")), ",").as("part_suffixes"))
        .orderBy(col("l_orderkey"))
    },

    Q(
      "fn_map",
      """SELECT p_partkey, tag_key, tag_value
        |FROM (
        |  SELECT p_partkey, 'brand' AS tag_key, p_brand AS tag_value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'type', p_type FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size', CAST(p_size AS VARCHAR) FROM part WHERE p_size >= 10)
        |ORDER BY p_partkey, tag_key""".stripMargin
    ) { (s, d) =>
      // OSM-tag k→v map surface (README.md:93): build the map, filter
      // entries with map_filter, merge with map_concat, read with
      // element_at, then explode back to rows — rows are what the DuckDB
      // oracle can compare (map literals differ between dialects).
      T.part(s, d)
        .select(col("p_partkey"),
          map_concat(
            map(lit("brand"), col("p_brand"), lit("type"), col("p_type")),
            map_filter(
              map(lit("size"), col("p_size").cast("string")),
              (_, v) => v.cast("int") >= 10)
          ).as("tags"))
        .select(col("p_partkey"), explode(col("tags")).as(Seq("tag_key", "tag_value")))
        .orderBy(col("p_partkey"), col("tag_key"))
    },

    Q(
      "fn_map_higher",
      """SELECT p_partkey, tag_key, tag_value
        |FROM (
        |  SELECT p_partkey, 'SIZE' AS tag_key, CAST(p_size * 2 AS BIGINT) AS tag_value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'KEY', CAST(p_partkey % 100 AS BIGINT) FROM part)
        |ORDER BY p_partkey, tag_key""".stripMargin
    ) { (s, d) =>
      // Higher-order map rewrites (transform_keys / transform_values /
      // map_zip_with): the flex-style "promote + retype tags" step done
      // lazily on the map itself, no explode-regroup round trip. Rows out,
      // because map literals aren't dialect-portable (same stance as
      // fn_map's oracle).
      T.part(s, d)
        .select(col("p_partkey"),
          map(lit("size"), col("p_size").cast("long"),
              lit("key"), (col("p_partkey") % 100).cast("long")).as("m"))
        .select(col("p_partkey"),
          transform_keys(
            transform_values(col("m"),
              (k, v) => when(k === "size", v * 2).otherwise(v)),
            (k, _) => upper(k)).as("m2"))
        .select(col("p_partkey"), explode(col("m2")).as(Seq("tag_key", "tag_value")))
        .orderBy(col("p_partkey"), col("tag_key"))
    },

    Q(
      "fn_json",
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS INT)  AS k_extracted,
        |       CAST(json_extract(props, '$.k') AS INT)  AS k_typed,
        |       CAST(json_extract(props, '$.missing') AS VARCHAR) IS NULL AS no_missing
        |FROM events
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      // events.props is a JSON doc (FIXTURES.md): path extraction +
      // schema-full parse (from_json → struct) — the flex-config-style
      // structured-doc surface.
      T.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_extracted"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType)
        ))).getField("k").as("k_typed"),
        get_json_object(col("props"), "$.missing").isNull.as("no_missing")
      ).orderBy(col("event_id"))
    },

    Q(
      "fn_try",
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_linenumber - 1 = 0 THEN NULL
        |            ELSE round(100.0 / (l_linenumber - 1), 6) END AS price_per,
        |       TRY_CAST(l_returnflag AS INT) AS flag_int,
        |       TRY_CAST(CAST(l_partkey AS VARCHAR) AS INT) AS part_int
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      // ANSI-safe error lanes (try_divide / try_cast): under ANSI SQL a
      // single malformed row KILLS a 100 TB job hours in — the try_*
      // family turns row-level failures into NULLs the pipeline can
      // quarantine and count, keeping "one bad row" a data-quality
      // metric instead of a 3-hour retry. Three lanes: division whose
      // denominator legitimately hits zero, a cast that always fails
      // (alpha flag → INT), and a cast that always succeeds (numeric
      // string round-trip) — the oracle states each as its explicit
      // CASE/TRY_CAST equivalent.
      T.lineitem(s, d).selectExpr(
        "l_orderkey", "l_linenumber",
        "round(try_divide(100, l_linenumber - 1), 6) AS price_per",
        "try_cast(l_returnflag AS INT) AS flag_int",
        "try_cast(CAST(l_partkey AS STRING) AS INT) AS part_int"
      ).orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    Q(
      "fn_variant",
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS INT) AS k_int,
        |       CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
        |       json_extract_string(props, '$.missing') IS NULL AS no_missing
        |FROM events
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      // Spark 4's VARIANT type — the open-schema semi-structured path
      // that replaces string-re-parsing JSON: parse_json ingests ONCE
      // into a binary-encoded variant (fields are offset-indexed, so
      // each variant_get is a seek, not a re-tokenize — the difference
      // between O(doc) per extraction and O(doc) per INGEST at 100 TB),
      // then typed extraction casts at the leaf. A lake would store the
      // VARIANT column itself (parquet shreds it); the oracle states the
      // same accesses over DuckDB's JSON type.
      T.events(s, d).selectExpr(
        "event_id",
        "variant_get(parse_json(props), '$.k', 'int') AS k_int",
        "variant_get(parse_json(props), '$.k', 'double') AS k_dbl",
        "variant_get(parse_json(props), '$.missing', 'string') IS NULL AS no_missing"
      ).orderBy(col("event_id"))
    },

    Q(
      "fn_collation",
      """SELECT lower(p_brand) AS brand_ci,
        |       count(*) AS n_parts,
        |       count(DISTINCT p_type) AS n_types
        |FROM part
        |GROUP BY lower(p_brand)
        |ORDER BY brand_ci NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // Spark 4 COLLATION — case-insensitive grouping declared as a TYPE
      // property (`collate(c, 'UTF8_LCASE')`) instead of materializing
      // lower(c): the comparison/hash semantics live in the collated
      // string type, so every downstream groupBy/join/sort on the column
      // is case-insensitive without a rewritten expression at each use
      // site (and without the lower() copy of a 100 TB string column on
      // the wire — the collation key is computed inside the hash/compare
      // itself). The group key is presented lower()ed so both engines
      // print one canonical representative; for the fixture's ASCII
      // domain the UTF8_LCASE equivalence classes are exactly lower()'s,
      // which is what the DuckDB oracle states. Same partial+final
      // aggregate shape as every groupBy.
      T.part(s, d)
        .groupBy(expr("collate(p_brand, 'UTF8_LCASE')").as("brand_key"))
        .agg(count(lit(1)).as("n_parts"),
             countDistinct(col("p_type")).as("n_types"))
        .select(lower(col("brand_key")).cast("string").as("brand_ci"),
                col("n_parts"), col("n_types"))
        .orderBy(col("brand_ci"))
    },

    Q(
      "fn_hash",
      """SELECT c_custkey,
        |       md5(c_name)    AS name_md5,
        |       sha256(c_name) AS name_sha256
        |FROM customer
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      // Content-hash identity (dedup_exact's primitive). md5/sha256 are
      // cross-engine stable; xxhash64 is Spark-internal (used in the
      // non-oracled dedup path where speed matters, not here).
      T.customer(s, d).select(
        col("c_custkey"),
        md5(col("c_name")).as("name_md5"),
        sha2(col("c_name"), 256).as("name_sha256")
      ).orderBy(col("c_custkey"))
    },

    Q(
      "fn_null_safe",
      """SELECT c_custkey,
        |       nullif(c_mktsegment, 'BUILDING') AS seg_n,
        |       (nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY') AS is_mach,
        |       (nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL) AS was_building,
        |       (nullif(c_mktsegment, 'BUILDING') IS DISTINCT FROM c_mktsegment) AS changed
        |FROM customer
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      // Null-safe equality (<=> / IS NOT DISTINCT FROM): the three-valued-
      // logic corner every dedup/delta join trips over — NULL = NULL is
      // NULL under plain equality, TRUE under null-safe. merge_upsert and
      // snapshot deltas rely on these semantics being exact.
      val segN = nullif(col("c_mktsegment"), lit("BUILDING"))
      T.customer(s, d).select(
        col("c_custkey"),
        segN.as("seg_n"),
        (segN <=> lit("MACHINERY")).as("is_mach"),
        (segN <=> lit(null).cast("string")).as("was_building"),
        (!(segN <=> col("c_mktsegment"))).as("changed")
      ).orderBy(col("c_custkey"))
    },

    Q(
      "fn_bitwise",
      """SELECT o_orderkey,
        |       o_orderkey & 255                     AS low_byte,
        |       o_orderkey | 4096                    AS with_flag,
        |       xor(o_orderkey, 21845)               AS toggled,
        |       o_orderkey << 3                      AS shl3,
        |       o_orderkey >> 2                      AS shr2,
        |       CAST(bit_count(o_orderkey) AS INT)   AS popcount
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      // Bit-level ops: flag packing, hash mixing, the simhash/bucket
      // primitives — all codegen'd single-instruction expressions.
      T.orders(s, d).select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).as("low_byte"),
        col("o_orderkey").bitwiseOR(4096).as("with_flag"),
        col("o_orderkey").bitwiseXOR(21845).as("toggled"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        bit_count(col("o_orderkey")).as("popcount")
      ).orderBy(col("o_orderkey"))
    }
  )
}
