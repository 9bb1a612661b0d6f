package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.B — projections, filters, predicates.
  *
  * Reference evidence: flex-style tag predicates route elements into layer
  * tables (`/root/reference/README.md:93`). All predicates here compile to
  * codegen'd filters pushed to the parquet scan.
  */
object Filters {

  val all: Seq[Q] = Seq(
    Q(
      "project",
      """SELECT p_partkey,
        |       upper(p_brand)             AS brand_uc,
        |       p_retailprice * p_size     AS price_volume,
        |       p_type || '/' || p_brand   AS type_brand
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      T.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        (col("p_retailprice") * col("p_size")).as("price_volume"),
        concat(col("p_type"), lit("/"), col("p_brand")).as("type_brand")
      ).orderBy(col("p_partkey"))
    },

    Q(
      "project_unpivot",
      """SELECT l_orderkey, l_linenumber, measure, CAST(value AS DOUBLE) AS value
        |FROM (SELECT l_orderkey, l_linenumber,
        |             l_quantity AS qty, l_extendedprice AS price,
        |             l_discount AS discount, l_tax AS tax
        |      FROM lineitem WHERE l_orderkey % 100 = 0)
        |UNPIVOT (value FOR measure IN (qty, price, discount, tax))
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin
    ) { (s, d) =>
      // Native UNPIVOT/melt (Spark 3.4+ `Dataset.unpivot` — the typed
      // API, not a hand-rolled stack()): wide measure columns → long
      // (entity, measure, value) form, the reshape every metrics store
      // and ML feature pipeline does before a per-measure groupBy. The
      // operator is a GENERATOR (Expand, #measures rows per input row,
      // no shuffle) and keeps column-pruning intact: only the unpivoted
      // measures and ids reach the scan. DuckDB's UNPIVOT mirrors the
      // semantics textually — both engines emit one row per (id,
      // measure) with the measure NAME as a column, which is the part
      // a UNION-ALL emulation gets subtly wrong (ordering/typing of
      // the name column).
      T.lineitem(s, d)
        .where(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
                col("l_discount").as("discount"), col("l_tax").as("tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
                 Array(col("qty"), col("price"), col("discount"), col("tax")),
                 "measure", "value")
        // (l_orderkey, l_linenumber) is NOT unique in this fixture (the
        // join_self lesson) — value joins the sort to make it total
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"), col("value"))
    },

    Q(
      "filter_simple",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    Q(
      "filter_compound",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE ((l_quantity > 30 AND l_returnflag IN ('A', 'R'))
        |       OR NOT (l_linestatus = 'O'))
        |  AND l_discount BETWEEN 0.02 AND 0.08
        |  AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .filter(((col("l_quantity") > 30 && col("l_returnflag").isin("A", "R"))
                  || !(col("l_linestatus") === "O"))
                && col("l_discount").between(0.02, 0.08)
                && col("l_shipdate").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_discount"), col("l_returnflag"), col("l_linestatus"))
        // (l_orderkey, l_linenumber) is NOT unique in the corpus — order by
        // every output column so the sort is total (oracle determinism).
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                 col("l_discount"), col("l_returnflag"), col("l_linestatus"))
    },

    Q(
      "filter_like",
      """SELECT p_partkey, p_name, p_type
        |FROM part
        |WHERE p_name LIKE '%widget%'
        |   OR regexp_matches(p_name, '^(red|blue) ')
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      T.part(s, d)
        .filter(col("p_name").like("%widget%") || col("p_name").rlike("^(red|blue) "))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))
    }
  )
}
