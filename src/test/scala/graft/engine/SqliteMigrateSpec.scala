package graft.engine

import graft.SparkSpec
import graft.sources.SqliteFile
import org.scalatest.funsuite.AnyFunSuite

/** Migration path: open an actual graphydb SQLite database file. The
  * fixture (src/test/resources/migrate.gdb) was written BY THE REFERENCE
  * LIBRARY itself (graphydb.py driving sqlite3): 2505 nodes across
  * multi-level b-tree pages, a 6000-char payload spanning overflow pages,
  * unicode props, journaled changes including a modify, settings and cache
  * rows. The zero-dependency reader + MemGraph import must reproduce all
  * of it — including a working undo over the imported history. */
class SqliteMigrateSpec extends AnyFunSuite with SparkSpec {

  private def fixture: String =
    getClass.getResource("/migrate.gdb").getPath

  test("SqliteFile: schema table lists the five reference tables") {
    val t = SqliteFile.tables(fixture)
    assert(Set("nodes", "edges", "settings", "cache", "changes").subsetOf(t.keySet))
    assert(!t.contains("nodefts"), "FTS5 virtual tables have no b-tree root")
  }

  test("SqliteFile: full scans cross interior pages and overflow chains") {
    val nodes = SqliteFile.readTable(fixture, "nodes")
    assert(nodes.size == 2505, "multi-page b-tree scan must see every row")
    // (uid, kind, ctime, mtime, data); the 6000-char body spills to
    // overflow pages at the 4096 page size
    val doc = nodes.find(_.values(1) == "Doc").get
    val data = graft.core.Json.parse(doc.values(4).asInstanceOf[String])
    assert(data("body").asInstanceOf[String].length == 6000)
    assert(data("body").asInstanceOf[String].forall(_ == 'x'))
    assert(data("marker") == "overflow")
    // changes.id is INTEGER PRIMARY KEY (rowid alias): ids come from rowid
    val changes = SqliteFile.readTable(fixture, "changes")
    assert(changes.map(_.rowid) == (1L to changes.size).toVector)
  }

  test("fromSqlite: full graph state imports — items, props, unicode, KV") {
    val g = GraphSession.fromSqlite(spark, fixture)
    assert(g.nodesMap.size == 2505 && g.edgesMap.size == 3)
    val anne = g.fetchN("(n)", Seq("""n.data.name = "Anne"""")).one.get
    assert(anne("nickname") == "Annie")
    val coffee = g.fetchN("(n)", Seq("""n.data.sort = "Coffee"""")).one.get
    assert(coffee("note") == "café ☕ 中文", "unicode survives the byte-level read")
    assert(g.getSetting("scheme") == Map("version" -> 3L, "owner" -> "tester"))
    assert(g.cacheGet("warm") == Seq(1L, 2.5, "three"))
  }

  test("fromSqlite: chain queries run over the migrated graph") {
    val g = GraphSession.fromSqlite(spark, fixture)
    // the docstring flagship: coffee drinkers with strength
    val drinkers = g.fetchN("[p:Person,strength] -(e:Drinks)> (d:Drink)",
      Seq("""d.data.sort = "Coffee""""),
      params = Map("strength" -> "e.data.strength"))
    val names = drinkers.toSeq.map(i => (i("name"), i("_strength"))).toSet
    assert(names == Set(("Anne", "strong"), ("Bob", "weak")))
  }

  test("fromSqlite: imported journal supports undo of reference-made changes") {
    val g = GraphSession.fromSqlite(spark, fixture)
    assert(g.countChanges == 9L)
    val before = g.fetchN("(n)", Seq("""n.data.name = "Bob"""")).one.get
    assert(before("nickname") == "Bobbles", "fixture's last change renamed Bob")
    g.undo() // reverts the reference-side modify
    val after = g.fetchN("(n)", Seq("""n.data.name = "Bob"""")).one.get
    assert(after("nickname") == "Bobby")
    assert(g.countChanges == 8L)
  }

  test("hot -wal sidecar fails loudly instead of returning stale data (r6)") {
    val dir = java.nio.file.Files.createTempDirectory("walguard")
    val db = dir.resolve("hot.gdb")
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixture), db)
    val wal = dir.resolve("hot.gdb-wal")
    try {
      // empty sidecar (fully checkpointed, persisted WAL file): fine to read
      java.nio.file.Files.write(wal, Array.emptyByteArray)
      assert(SqliteFile.tables(db.toString).contains("nodes"))
      // non-empty sidecar: unreplayed committed frames may exist — refuse
      java.nio.file.Files.write(wal, Array[Byte](1, 2, 3))
      val e = intercept[IllegalStateException](SqliteFile.readTable(db.toString, "nodes"))
      assert(e.getMessage.contains("wal_checkpoint"), "message must carry the fix")
    } finally {
      java.nio.file.Files.deleteIfExists(wal)
      java.nio.file.Files.deleteIfExists(db)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("-journal sidecar: PERSIST-mode (zeroed header) reads, hot magic refuses") {
    val dir = java.nio.file.Files.createTempDirectory("journalguard")
    val db = dir.resolve("p.gdb")
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixture), db)
    val journal = dir.resolve("p.gdb-journal")
    try {
      // journal_mode=PERSIST leaves a NON-EMPTY journal with a zeroed
      // header after a perfectly clean close — must migrate, not refuse
      java.nio.file.Files.write(journal, new Array[Byte](512))
      assert(SqliteFile.tables(db.toString).contains("nodes"))
      // hot magic header = uncommitted transaction this reader can't roll
      // back — must refuse with the fix in the message
      val hot = Array(0xd9, 0xd5, 0x05, 0xf9, 0x20, 0xa1, 0x63, 0xd7).map(_.toByte) ++
        new Array[Byte](504)
      java.nio.file.Files.write(journal, hot)
      val e = intercept[IllegalStateException](SqliteFile.readTable(db.toString, "nodes"))
      assert(e.getMessage.contains("-journal"))
      // truncated sidecar shorter than the 8-byte magic: cannot be hot
      java.nio.file.Files.write(journal, Array[Byte](0x1))
      assert(SqliteFile.tables(db.toString).contains("nodes"))
    } finally {
      java.nio.file.Files.deleteIfExists(journal)
      java.nio.file.Files.deleteIfExists(db)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("fromSqlite: FTS rebuilds from imported content") {
    val g = GraphSession.fromSqlite(spark, fixture)
    g.resetFts(nodeFields = Seq("name"))
    g.reindexFts() // bulk re-index of imported content (new items index via updatefts)
    val hits = g.fetchN("(n)", params = Map("n_fts" -> "An*"))
    assert(hits.toSeq.map(_("name")).toSet == Set("Anne"))
  }
}
