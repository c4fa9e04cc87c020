package graft.queries

import graft.{QueryDef, Tables}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 tail tier: row-level DELETE / UPDATE on snapshot tables —
  * the two table-API verbs between plain publish and MERGE, each
  * copy-on-write with stats-pruned touched-file discovery, each under
  * the DuckDB oracle.
  */
object Extras5 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def freshRoot(s: SparkSession, owner: String, name: String, dir: String): String = {
    val root = graft.Scratch.dir(owner, name, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true) // idempotent rerun
    root
  }

  val entries: Seq[QueryDef] = Seq(

    // Row-level DELETE, copy-on-write: publish orders range-clustered on
    // o_orderdate, then delete the 1994 band — the retention-expiry
    // shape. The predicate's bounding box rides `pruneRanges`, so the
    // touched-file probe scans only the files whose footer stats admit
    // 1994 rows, and only those files rewrite; every other file carries
    // into v2 BY REFERENCE. The oracle recomputes both versions from the
    // source: the v1 row passing AFTER the delete proves history stayed
    // intact (time travel to pre-delete data — and a compliance erase is
    // this plus expire+vacuum); the v2 row proves exact DELETE
    // semantics; the in-row `pruned` flag (v1∩v2 file sharing observed
    // from the manifests) self-evidences that the rewrite was banded,
    // not a table rewrite. At 100 TB: expiring a month costs that
    // month's files, not the table.
    QueryDef.checked(
      "q144_snapshot_delete",
      """SELECT 'v1' AS part, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(1 AS BOOLEAN) AS pruned
        |FROM orders
        |UNION ALL
        |SELECT 'v2', count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(1 AS BOOLEAN)
        |FROM orders
        |WHERE o_orderdate NOT BETWEEN TIMESTAMP '1994-01-01 00:00:00'
        |                          AND TIMESTAMP '1994-12-31 23:59:59'""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q144_snapshot_delete", "snap_delete", dir)
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root, orders.repartitionByRange(16, col("o_orderdate")))
      val (lo, hi) = ("1994-01-01 00:00:00", "1994-12-31 23:59:59")
      Snapshots.deleteWhere(s, root,
        col("o_orderdate").between(lit(lo), lit(hi)),
        pruneRanges = Map("o_orderdate" -> (lo, hi)))
      val f1 = Snapshots.files(s, root, 1).toSet
      val f2 = Snapshots.files(s, root, 2).toSet
      // copy-on-write evidence: out-of-band files carried by reference
      val banded = (f1 & f2).nonEmpty && (f1 -- f2).size < f1.size
      Seq(1, 2).map { v =>
        Snapshots.read(s, root, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).cast("long").as("sum_key"))
          .select(lit(s"v$v").as("part"), col("n_rows"), col("sum_key"),
            lit(banded).as("pruned"))
      }.reduce(_.unionByName(_))
    },

    // Row-level UPDATE, copy-on-write: bump o_custkey and restamp
    // o_orderpriority for the 1995 band. Assignments evaluate against
    // the OLD row (increment semantics) and cast to the column's
    // existing type, so the schema is invariant; NULL-predicate rows
    // stay untouched. Same banded-rewrite mechanics as q144 — the
    // oracle's CASE WHEN recompute proves exact UPDATE semantics on v2
    // and intact history on v1, and `pruned` evidences file sharing.
    QueryDef.checked(
      "q145_snapshot_update",
      """SELECT 'v1' AS part, count(*) AS n_rows,
        |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
        |  CAST(0 AS BIGINT) AS n_touched, CAST(1 AS BOOLEAN) AS pruned
        |FROM orders
        |UNION ALL
        |SELECT 'v2', count(*),
        |  CAST(sum(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |                                     AND TIMESTAMP '1995-12-31 23:59:59'
        |           THEN o_custkey + 1000 ELSE o_custkey END) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |                                              AND TIMESTAMP '1995-12-31 23:59:59')
        |    AS BIGINT),
        |  CAST(1 AS BOOLEAN)
        |FROM orders""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q145_snapshot_update", "snap_update", dir)
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root, orders.repartitionByRange(16, col("o_orderdate")))
      val (lo, hi) = ("1995-01-01 00:00:00", "1995-12-31 23:59:59")
      Snapshots.updateWhere(s, root,
        col("o_orderdate").between(lit(lo), lit(hi)),
        set = Map(
          "o_custkey" -> (col("o_custkey") + 1000),
          "o_orderpriority" -> lit("9-TOUCHED")),
        pruneRanges = Map("o_orderdate" -> (lo, hi)))
      val f1 = Snapshots.files(s, root, 1).toSet
      val f2 = Snapshots.files(s, root, 2).toSet
      val banded = (f1 & f2).nonEmpty && (f1 -- f2).size < f1.size
      Seq(1, 2).map { v =>
        Snapshots.read(s, root, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_custkey")).cast("long").as("sum_cust"),
            sum(when(col("o_orderpriority") === "9-TOUCHED", 1).otherwise(0))
              .cast("long").as("n_touched"))
          .select(lit(s"v$v").as("part"), col("n_rows"), col("sum_cust"),
            col("n_touched"), lit(banded).as("pruned"))
      }.reduce(_.unionByName(_))
    },

    // MERGE-ON-READ delete vectors end-to-end: v2 deletes every
    // o_orderkey ≡ 3 (mod 11) by committing ONLY a key file (`no_rewrite`
    // proves no data file moved — the O(deleted keys) commit that makes
    // a GDPR erase on a 100 TB table a seconds-long operation); v3
    // re-inserts a slice of the deleted keys, and SEQUENCE semantics
    // keep them visible (the dv applies only to files that existed when
    // it was committed — the re-registered-user case every naive
    // equality-delete design gets wrong); v4 materializes, rewriting
    // only the files that held a doomed row. The oracle recomputes all
    // four versions from the source, so the hash match proves the whole
    // ladder: MoR read, sequence-correct re-insert, and
    // materialize-read-identity — while v1 passing proves history
    // survived all three mutations.
    QueryDef.checked(
      "q146_mor_delete",
      """SELECT 'v1' AS part, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(count(*) FILTER (WHERE o_orderkey % 11 = 3) AS BIGINT) AS n_key3,
        |  CAST(1 AS BOOLEAN) AS no_rewrite
        |FROM orders
        |UNION ALL
        |SELECT 'v2', count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(0 AS BIGINT), CAST(1 AS BOOLEAN)
        |FROM orders WHERE o_orderkey % 11 <> 3
        |UNION ALL
        |SELECT 'v3', count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE o_orderkey % 11 = 3) AS BIGINT),
        |  CAST(1 AS BOOLEAN)
        |FROM orders WHERE o_orderkey % 11 <> 3
        |   OR (o_orderkey % 11 = 3 AND o_orderkey < 1000)
        |UNION ALL
        |SELECT 'v4', count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE o_orderkey % 11 = 3) AS BIGINT),
        |  CAST(1 AS BOOLEAN)
        |FROM orders WHERE o_orderkey % 11 <> 3
        |   OR (o_orderkey % 11 = 3 AND o_orderkey < 1000)""".stripMargin) { (s, dir) =>
      val root = freshRoot(s, "q146_mor_delete", "snap_mor", dir)
      val orders = t(s, dir, "orders")
      Snapshots.publish(s, root, orders.repartitionByRange(16, col("o_orderdate")))
      val doomed = orders.filter(col("o_orderkey") % 11 === 3)
      Snapshots.deleteByKey(s, root, doomed.select("o_orderkey"))
      // dv commit touched no data file: v2's data file list == v1's
      val noRewrite =
        Snapshots.files(s, root, 2) == Snapshots.files(s, root, 1)
      Snapshots.publish(s, root,
        doomed.filter(col("o_orderkey") < 1000), append = true)
      Snapshots.materializeDeletes(s, root)
      Seq(1, 2, 3, 4).map { v =>
        Snapshots.read(s, root, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).cast("long").as("sum_key"),
            sum(when(col("o_orderkey") % 11 === 3, 1).otherwise(0))
              .cast("long").as("n_key3"))
          .select(lit(s"v$v").as("part"), col("n_rows"), col("sum_key"),
            col("n_key3"), lit(noRewrite).as("no_rewrite"))
      }.reduce(_.unionByName(_))
    }
  )
}
