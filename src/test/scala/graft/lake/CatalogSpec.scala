package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cross-session catalog persistence — the Glue-databases contract
  * (demo_stack.py:94-100): raw/processed databases and their tables
  * must survive a full session restart against the same warehouse +
  * metastore. Runs with its OWN Hive-metastore-backed sessions (unique
  * dirs), and restores a clean slate so suites running after this one
  * rebuild the default in-memory-catalog session untouched.
  *
  * Deliberately NOT extending SparkSpec: this suite owns the session
  * lifecycle (stop, restart, stop).
  */
class CatalogSpec extends AnyFunSuite {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_${tag}_").toString

  test("raw/processed databases and tables survive a session restart") {
    // Release any shared in-memory-catalog session first: catalog
    // implementation is fixed at session creation.
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val wh = freshDir("wh")
    val ms = freshDir("ms")

    val s1 = Catalog.persistentSession("local[4]", wh, ms)
    try {
      import s1.implicits._
      Catalog.publish(s1, "raw", "colors",
        Seq((1, "red"), (2, "green"), (3, "blue")).toDF("id", "name"))
      Catalog.publish(s1, "processed", "color_stats",
        s1.table("raw.colors").groupBy().count())
      assert(s1.sql("SELECT count(*) FROM processed.color_stats").head().getLong(0) == 1)
    } finally s1.stop()

    // A genuinely fresh session against the same warehouse + metastore:
    // both databases and tables must still be addressable by name.
    val s2 = Catalog.persistentSession("local[4]", wh, ms)
    try {
      val dbs = s2.sql("SHOW DATABASES").collect().map(_.getString(0)).toSet
      assert(dbs.contains("raw") && dbs.contains("processed"),
        s"databases lost across restart: $dbs")
      val rows = s2.sql("SELECT id, name FROM raw.colors ORDER BY id").collect()
      assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
        Seq((1, "red"), (2, "green"), (3, "blue")))
      assert(s2.table("processed.color_stats").head().getLong(0) == 3)
    } finally {
      s2.stop()
      // leave no active/default session so later suites' getOrCreate
      // builds the standard in-memory-catalog test session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
