package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.G — set operations.
  *
  * Reference evidence: per-region task groups feed one DB (union,
  * `/root/reference/osm_etl.py:69-85`); border objects appear in
  * overlapping extracts (dedup union); weekly snapshots imply diffing
  * (intersect/except, `osm_etl.py:13,45`).
  *
  * The two "snapshots" are overlapping status slices of orders, so every
  * set op has non-trivial rows on both sides.
  */
object SetOps {

  private def snapA(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).where(col("o_orderstatus").isin("F", "P"))
      .select(col("o_custkey"), col("o_orderpriority"))

  private def snapB(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).where(col("o_orderstatus").isin("P", "O"))
      .select(col("o_custkey"), col("o_orderpriority"))

  private val aSql = "SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus IN ('F','P')"
  private val bSql = "SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus IN ('P','O')"
  private val ord  = "ORDER BY o_custkey, o_orderpriority"

  val all: Seq[Q] = Seq(
    Q("union_all", s"SELECT * FROM (($aSql) UNION ALL ($bSql)) t $ord") { (s, d) =>
      snapA(s, d).unionByName(snapB(s, d))
        .orderBy(col("o_custkey"), col("o_orderpriority"))
    },

    Q("union_distinct", s"SELECT * FROM (($aSql) UNION ($bSql)) t $ord") { (s, d) =>
      snapA(s, d).unionByName(snapB(s, d)).distinct()
        .orderBy(col("o_custkey"), col("o_orderpriority"))
    },

    Q("intersect", s"SELECT * FROM (($aSql) INTERSECT ($bSql)) t $ord") { (s, d) =>
      snapA(s, d).intersect(snapB(s, d))
        .orderBy(col("o_custkey"), col("o_orderpriority"))
    },

    Q("intersect_all", s"SELECT * FROM (($aSql) INTERSECT ALL ($bSql)) t $ord") { (s, d) =>
      snapA(s, d).intersectAll(snapB(s, d))
        .orderBy(col("o_custkey"), col("o_orderpriority"))
    },

    Q("except", s"SELECT * FROM (($aSql) EXCEPT ($bSql)) t $ord") { (s, d) =>
      snapA(s, d).except(snapB(s, d))
        .orderBy(col("o_custkey"), col("o_orderpriority"))
    },

    Q("except_all", s"SELECT * FROM (($aSql) EXCEPT ALL ($bSql)) t $ord") { (s, d) =>
      snapA(s, d).exceptAll(snapB(s, d))
        .orderBy(col("o_custkey"), col("o_orderpriority"))
    }
  )
}
