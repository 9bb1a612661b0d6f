package graft.operators

import graft.{Q, T}
import graft.functions.BBoxAgg
import org.apache.spark.sql.functions._

/** SURVEY.md §2.L — user-extension surface (UDF / UDAF / UDTF).
  *
  * Reference analog: PgOSM Flex styles are user-code hooks per object
  * (`/root/reference/README.md:93`). Preference order is documented in §2.L:
  * builtins > higher-order exprs > typed Aggregator > Scala UDF (opaque to
  * Catalyst: no pushdown through it, breaks codegen) — the UDF below exists
  * to prove the surface, with its builtin equivalent as the oracle.
  */
object Extensibility {

  // typed-surface records for `ds_typed` (top-level so spark.implicits
  // can derive their Encoders; method-local case classes cannot)
  final case class Nation(n_nationkey: Long, n_name: String, n_regionkey: Long)
  final case class NationOut(nation_key: Long, nation_uc: String, name_len: Long)

  val all: Seq[Q] = Seq(
    Q(
      "udf_scalar",
      """SELECT p_partkey, replace(lower(p_name), ' ', '-') AS slug
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      // Scalar Scala UDF (slugify). The oracle is the builtin formulation —
      // same semantics, and in production code the builtin wins (codegen,
      // null-safety, pushdown through the projection).
      val slugify = udf((name: String) => if (name == null) null else name.toLowerCase.replace(' ', '-'))
      T.part(s, d)
        .select(col("p_partkey"), slugify(col("p_name")).as("slug"))
        .orderBy(col("p_partkey"))
    },

    Q(
      "udaf_aggregator",
      """SELECT s_nationkey,
        |       'BOX(' || CAST(min(s_suppkey * 10) AS VARCHAR) || '.00 ' ||
        |       printf('%.2f', min(round(s_acctbal * 100)) / 100.0) || ', ' ||
        |       CAST(max(s_suppkey * 10) AS VARCHAR) || '.00 ' ||
        |       printf('%.2f', max(round(s_acctbal * 100)) / 100.0) || ')' AS bbox
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin
    ) { (s, d) =>
      // Typed Aggregator folding (x, y) points into a bbox envelope —
      // decomposable into min/max, which is exactly what the oracle does.
      T.supplier(s, d)
        .select(col("s_nationkey"),
                (col("s_suppkey") * 1000).as("x_centi"),
                round(col("s_acctbal") * 100).cast("long").as("y_centi"))
        .groupBy(col("s_nationkey"))
        .agg(BBoxAgg(col("x_centi"), col("y_centi")).as("bbox"))
        .orderBy(col("s_nationkey"))
    },

    Q(
      "udtf_generator",
      """SELECT o_orderkey, i AS installment_no,
        |       (CAST(round(o_totalprice * 100) AS BIGINT) // (o_orderkey % 3 + 1)) / 100.0 AS installment_amt
        |FROM orders, unnest(range(1, o_orderkey % 3 + 2)) AS t(i)
        |ORDER BY o_orderkey, installment_no""".stripMargin
    ) { (s, d) =>
      // Table function (1 row → N rows): computed sequence + posexplode —
      // Spark's Generator surface, zero-copy through whole-stage codegen.
      // The reference analog is one OSM element fanning out into multiple
      // layer rows (osm_layer_extract does the tag-driven version).
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
                (col("o_orderkey") % 3 + 1).as("n_inst"))
        .select(col("o_orderkey"),
                explode(expr("sequence(1, n_inst)")).as("installment_no"),
                // integer-cents floor division: exact on both engines (a
                // decimal divide's scale/rounding rules are dialect-specific)
                (expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV n_inst") / 100.0)
                  .as("installment_amt"))
        .orderBy(col("o_orderkey"), col("installment_no"))
    },

    Q(
      "ds_typed",
      """SELECT n_nationkey AS nation_key, upper(n_name) AS nation_uc,
        |       CAST(length(n_name) AS BIGINT) AS name_len
        |FROM nation
        |WHERE n_regionkey IN (0, 2)
        |ORDER BY nation_key""".stripMargin
    ) { (s, d) =>
      // The typed Dataset[T] surface (SURVEY §1.2: case-class Encoders
      // where compile-time typing pays). filter/map run as typed lambdas —
      // note the cost model this demonstrates: typed lambdas are opaque to
      // Catalyst (the filter CANNOT push to the scan, unlike every Column
      // filter in this repo), which is exactly why the engine uses them
      // only at typed boundaries, not in scan paths.
      import s.implicits._
      T.nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .as[Nation]
        .filter((n: Nation) => n.n_regionkey == 0L || n.n_regionkey == 2L)
        .map((n: Nation) => NationOut(n.n_nationkey, n.n_name.toUpperCase, n.n_name.length.toLong))
        .toDF()
        .orderBy(col("nation_key"))
    }
  )
}
