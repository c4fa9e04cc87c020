package graft

import graft.operators.Snapshots
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the versioned-snapshot layer: publish/time-travel/append file
  * sharing, roll-forward rollback, diff, expire+vacuum reachability, and
  * crash-debris invisibility. q128 carries the oracle-checked contents
  * claim; these specs pin the file-level mechanics the oracle can't see.
  */
class SnapshotsSpec extends AnyFunSuite {
  import SparkTestEnv._

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-snap-$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def orders = Tables.load(spark, sf, "orders")

  test("publish assigns consecutive versions and read time-travels") {
    val root = freshRoot("travel")
    val early = orders.filter(col("o_orderdate") < lit("1996-01-01"))
    val v1 = Snapshots.publish(spark, root, early)
    val v2 = Snapshots.publish(spark, root, orders)
    assert(v1 == 1 && v2 == 2)
    assert(Snapshots.versions(spark, root) == Seq(1, 2))
    assert(Snapshots.read(spark, root, Some(1)).count() == early.count())
    assert(Snapshots.read(spark, root).count() == orders.count()) // latest
  }

  test("append publish shares the previous version's files, never copies") {
    val root = freshRoot("append")
    val early = orders.filter(col("o_orderdate") < lit("1996-01-01"))
    val late = orders.filter(col("o_orderdate") >= lit("1996-01-01"))
    Snapshots.publish(spark, root, early)
    Snapshots.publish(spark, root, late, append = true)
    val f1 = Snapshots.files(spark, root, 1).toSet
    val f2 = Snapshots.files(spark, root, 2).toSet
    assert(f1.subsetOf(f2), "append must retain every v1 file")
    assert(f2.size > f1.size, "append must add the new files")
    assert(Snapshots.read(spark, root, Some(2)).count() == orders.count())
    // v1 is still exactly the early slice — immutability of published data
    assert(Snapshots.read(spark, root, Some(1)).count() == early.count())
  }

  test("rollback rolls FORWARD: new version, old contents, history intact") {
    val root = freshRoot("rollback")
    val early = orders.filter(col("o_orderdate") < lit("1996-01-01"))
    Snapshots.publish(spark, root, early)
    Snapshots.publish(spark, root, orders)
    val v3 = Snapshots.rollback(spark, root, toVersion = 1)
    assert(v3 == 3)
    assert(Snapshots.versions(spark, root) == Seq(1, 2, 3))
    assert(Snapshots.files(spark, root, 3) == Snapshots.files(spark, root, 1))
    // the rolled-back-FROM version remains auditable
    assert(Snapshots.read(spark, root, Some(2)).count() == orders.count())
  }

  test("diff reports exactly the added and removed files") {
    val root = freshRoot("diff")
    Snapshots.publish(spark, root, orders.limit(10))
    Snapshots.publish(spark, root, orders.limit(20)) // full refresh: all-new files
    val d = Snapshots.diff(spark, root, 1, 2).collect()
    val added = d.filter(_.getString(1) == "added").map(_.getString(0)).toSet
    val removed = d.filter(_.getString(1) == "removed").map(_.getString(0)).toSet
    assert(added == Snapshots.files(spark, root, 2).toSet)
    assert(removed == Snapshots.files(spark, root, 1).toSet)
    assert(Snapshots.diff(spark, root, 1, 1).isEmpty)
  }

  test("expire + vacuum deletes only unreachable files; shared files survive") {
    val root = freshRoot("vacuum")
    val early = orders.filter(col("o_orderdate") < lit("1996-01-01"))
    val late = orders.filter(col("o_orderdate") >= lit("1996-01-01"))
    Snapshots.publish(spark, root, early)
    Snapshots.publish(spark, root, late, append = true) // v2 shares v1's files
    assert(Snapshots.expire(spark, root, keepLast = 1) == Seq(1))
    // v1's files are still referenced by v2 — vacuum must delete NOTHING
    assert(Snapshots.vacuum(spark, root) == 0L)
    assert(Snapshots.read(spark, root).count() == orders.count())
  }

  test("expire + vacuum sweeps a superseded full refresh") {
    val root = freshRoot("vacuum2")
    Snapshots.publish(spark, root, orders.limit(10))
    Snapshots.publish(spark, root, orders.limit(20)) // full refresh, v1 orphaned
    val v1Files = Snapshots.files(spark, root, 1)
    Snapshots.expire(spark, root, keepLast = 1)
    assert(Snapshots.vacuum(spark, root) == v1Files.size.toLong)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    v1Files.foreach(f => assert(!fs.exists(new Path(s"$root/$f")), s"$f not deleted"))
    assert(Snapshots.read(spark, root).count() == 20)
  }

  test("crash debris is invisible to readers and swept by vacuum") {
    val root = freshRoot("crash")
    Snapshots.publish(spark, root, orders.limit(10))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crashed publish: data files written, manifest still a temp
    orders.limit(5).write.parquet(s"$root/data/crashed00000")
    val tmp = fs.create(new Path(s"$root/_snapshots/v2.tmp"), true)
    tmp.write("data/crashed00000/whatever\n".getBytes("UTF-8")); tmp.close()
    assert(Snapshots.versions(spark, root) == Seq(1), "temp manifest must be invisible")
    assert(Snapshots.read(spark, root).count() == 10)
    assert(Snapshots.vacuum(spark, root) >= 1L, "crashed data files must be swept")
    // the committed version is untouched
    assert(Snapshots.read(spark, root).count() == 10)
    // and a LATER publish still gets the next number after the debris
    assert(Snapshots.publish(spark, root, orders.limit(3)) == 2)
  }

  test("readAdded returns exactly the delta rows; empty for rollbacks") {
    val root = freshRoot("added")
    val early = orders.filter(col("o_orderdate") < lit("1996-01-01"))
    val late = orders.filter(col("o_orderdate") >= lit("1996-01-01"))
    Snapshots.publish(spark, root, early)
    Snapshots.publish(spark, root, late, append = true)
    assert(Snapshots.readAdded(spark, root, 1, 2).count() == late.count())
    // a rollback adds no files → empty delta, schema preserved
    Snapshots.rollback(spark, root, toVersion = 1)
    val delta = Snapshots.readAdded(spark, root, 2, 3)
    assert(delta.isEmpty)
    assert(delta.columns.sameElements(orders.columns))
    // across the whole history: v1 -> v3 adds nothing (v3 IS v1)
    assert(Snapshots.readAdded(spark, root, 1, 3).isEmpty)
  }

  test("read of a missing version and empty roots fail loudly") {
    val root = freshRoot("empty")
    assert(Snapshots.versions(spark, root).isEmpty)
    intercept[IllegalArgumentException](Snapshots.read(spark, root))
    Snapshots.publish(spark, root, orders.limit(1))
    intercept[IllegalArgumentException](Snapshots.files(spark, root, 99))
  }
}
