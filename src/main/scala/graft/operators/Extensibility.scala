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
    }
  )
}
