package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Zero-dependency read-only SQLite 3 table reader — the migration path for
  * the reference's on-disk databases (graphydb stores everything in five
  * rowid tables, graphydb.py:521-525), implemented against the public
  * SQLite file-format specification (sqlite.org/fileformat2.html): header,
  * table b-tree interior/leaf pages, varints, the record serial-type
  * system, and overflow-page chains.
  *
  * Deliberate scope: the whole file is read into memory (the reference
  * targets "moderate sized problems" of ~10k items, graphydb.py:19-21 —
  * its databases are megabytes); FTS5 virtual-table shadow tables are
  * ignored (the engine rebuilds its own postings via `resetfts`); a
  * surviving non-empty `-wal`/`-journal` sidecar is not replayed — opening
  * such a file throws with checkpoint instructions rather than silently
  * returning a possibly-stale graph (see [[requireCleanlyClosed]]).
  */
object SqliteFile {

  /** One table row: rowid + decoded column values in declaration order.
    * Values are null, java.lang.Long, java.lang.Double, String, or
    * Array[Byte] — SQLite's five storage classes. */
  final case class Rec(rowid: Long, values: IndexedSeq[Any])

  private final class Db(bytes: Array[Byte]) {
    require(bytes.length >= 100 &&
      new String(bytes, 0, 16, "ISO-8859-1") == "SQLite format 3\u0000",
      "not a SQLite 3 database file")
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val pageSize: Int = {
      val raw = buf.getShort(16) & 0xffff
      if (raw == 1) 65536 else raw
    }
    private val reserved = bytes(20) & 0xff
    val usable: Int = pageSize - reserved
    require((buf.getInt(56)) == 1, "only UTF-8 text encoding is supported")

    private def u16(off: Int): Int = buf.getShort(off) & 0xffff
    private def u32(off: Int): Long = buf.getInt(off) & 0xffffffffL

    /** (value, bytesConsumed) of the varint at `off`. */
    private def varint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(off + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        i += 1
        if ((b & 0x80) == 0) return (v, i)
      }
      ((v << 8) | (bytes(off + 8) & 0xff), 9)
    }

    private def pageOff(page: Int): Int = (page - 1) * pageSize

    /** Assemble a cell payload of `len` bytes starting at `off` with at most
      * `local` bytes stored inline; the rest follows an overflow chain whose
      * first page number sits right after the local portion. */
    private def payload(off: Int, len: Long, local: Int): Array[Byte] = {
      val out = new Array[Byte](len.toInt)
      System.arraycopy(bytes, off, out, 0, math.min(local, len.toInt))
      var done = math.min(local, len.toInt)
      var page = if (done < len) u32(off + local).toInt else 0
      while (done < len) {
        require(page > 0, "truncated overflow chain")
        val po = pageOff(page)
        val take = math.min(usable - 4, len.toInt - done)
        System.arraycopy(bytes, po + 4, out, done, take)
        done += take
        page = u32(po).toInt
      }
      out
    }

    /** Decode one record (serial-type header + body). */
    private def record(payload: Array[Byte]): IndexedSeq[Any] = {
      val pb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      def pvarint(off: Int): (Long, Int) = {
        var v = 0L; var i = 0
        while (i < 8) {
          val b = payload(off + i) & 0xff
          v = (v << 7) | (b & 0x7f); i += 1
          if ((b & 0x80) == 0) return (v, i)
        }
        ((v << 8) | (payload(off + 8) & 0xff), 9)
      }
      val (hdrLen, n0) = pvarint(0)
      var ho = n0
      val types = Vector.newBuilder[Long]
      while (ho < hdrLen) { val (t, n) = pvarint(ho); types += t; ho += n }
      var bo = hdrLen.toInt
      def sint(width: Int): Long = {
        var v = if ((payload(bo) & 0x80) != 0) -1L else 0L
        var i = 0
        while (i < width) { v = (v << 8) | (payload(bo + i) & 0xff); i += 1 }
        bo += width
        v
      }
      types.result().map {
        case 0 => null
        case t @ (1L | 2L | 3L | 4L) => java.lang.Long.valueOf(sint(t.toInt))
        case 5 => java.lang.Long.valueOf(sint(6))
        case 6 => java.lang.Long.valueOf(sint(8))
        case 7 => val d = pb.getDouble(bo); bo += 8; java.lang.Double.valueOf(d)
        case 8 => java.lang.Long.valueOf(0L)
        case 9 => java.lang.Long.valueOf(1L)
        case t if t >= 13 && t % 2 == 1 =>
          val len = ((t - 13) / 2).toInt
          val s = new String(payload, bo, len, "UTF-8"); bo += len; s
        case t if t >= 12 && t % 2 == 0 =>
          val len = ((t - 12) / 2).toInt
          val b = new Array[Byte](len); System.arraycopy(payload, bo, b, 0, len); bo += len; b
        case t => throw new IllegalArgumentException(s"reserved serial type $t")
      }
    }

    /** Full scan of the table b-tree rooted at `page`, in rowid order. */
    def scanTable(page: Int): Vector[Rec] = {
      val po = pageOff(page)
      val hdr = po + (if (page == 1) 100 else 0)
      val out = Vector.newBuilder[Rec]
      (bytes(hdr) & 0xff) match {
        case 5 => // interior table page: children left-to-right + rightmost
          val nCells = u16(hdr + 3)
          val ptrs = hdr + 12
          var i = 0
          while (i < nCells) {
            val cell = po + u16(ptrs + 2 * i)
            out ++= scanTable(u32(cell).toInt)
            i += 1
          }
          out ++= scanTable(u32(hdr + 8).toInt)
        case 13 => // leaf table page
          val nCells = u16(hdr + 3)
          val ptrs = hdr + 8
          // spill thresholds per the format spec (table b-tree leaf)
          val maxLocal = usable - 35
          val minLocal = (usable - 12) * 32 / 255 - 23
          var i = 0
          while (i < nCells) {
            var off = po + u16(ptrs + 2 * i)
            val (plen, n1) = varint(off); off += n1
            val (rowid, n2) = varint(off); off += n2
            val local =
              if (plen <= maxLocal) plen.toInt
              else {
                val k = minLocal + ((plen - minLocal) % (usable - 4)).toInt
                if (k <= maxLocal) k else minLocal
              }
            out += Rec(rowid, record(payload(off, plen, local)))
            i += 1
          }
        case t => throw new IllegalArgumentException(
          s"page $page is not a table b-tree page (type $t)")
      }
      out.result()
    }
  }

  private def tablesOf(db: Db): Map[String, Int] =
    db.scanTable(1).flatMap { r =>
      // sqlite_schema: (type, name, tbl_name, rootpage, sql)
      (r.values(0), r.values(1), r.values(3)) match {
        case ("table", name: String, root: java.lang.Long) if root.longValue > 0 =>
          Some(name -> root.intValue)
        case _ => None
      }
    }.toMap

  /** This reader does not replay write-ahead logs or rollback journals: a
    * non-empty `-wal`/`-journal` sidecar means the main file may be missing
    * committed transactions (or contain uncommitted ones), and silently
    * migrating it would hand back a stale graph. Fail loudly with the fix
    * instead — the normal state of a file being migrated is cleanly closed,
    * where SQLite removes both sidecars. */
  /** A rollback journal is only "hot" (holds an uncommitted transaction this
    * reader would need to roll back) when it starts with the 8-byte journal
    * magic; journal_mode=PERSIST leaves a non-empty journal with a zeroed
    * header after a perfectly clean close, which is safe to ignore. */
  private val hotJournalMagic =
    Array(0xd9, 0xd5, 0x05, 0xf9, 0x20, 0xa1, 0x63, 0xd7).map(_.toByte)

  private def requireCleanlyClosed(path: String): Unit =
    for (suffix <- Seq("-wal", "-journal")) {
      val sidecar = Paths.get(path + suffix)
      val hot = Files.exists(sidecar) && Files.size(sidecar) > 0 && (suffix match {
        case "-journal" =>
          val head = new Array[Byte](8)
          val in = Files.newInputStream(sidecar)
          val n = try in.readNBytes(head, 0, 8) finally in.close()
          n == 8 && java.util.Arrays.equals(head, hotJournalMagic)
        case _ => true // any non-empty -wal may hold committed frames
      })
      if (hot)
        throw new IllegalStateException(
          s"'$path' has a hot '$suffix' sidecar: the database was not cleanly " +
            "closed and this reader does not replay logs, so reading now could return " +
            "stale or torn data. Close every connection (or run `PRAGMA wal_checkpoint" +
            "(TRUNCATE)` from sqlite3) and retry.")
    }

  /** Table name → b-tree root page, from sqlite_schema (root page 1).
    * Virtual tables (FTS5) have rootpage 0 and are excluded. */
  def tables(path: String): Map[String, Int] = {
    requireCleanlyClosed(path)
    tablesOf(new Db(Files.readAllBytes(Paths.get(path))))
  }

  /** All rows of `table`, in rowid order. A column declared INTEGER PRIMARY
    * KEY is a rowid alias and reads back as NULL — callers substitute
    * `rowid` (the reference's `changes.id` is the one such column). */
  def readTable(path: String, table: String): Vector[Rec] = {
    requireCleanlyClosed(path)
    val db = new Db(Files.readAllBytes(Paths.get(path)))
    val roots = tablesOf(db)
    val root = roots.getOrElse(table,
      throw new NoSuchElementException(
        s"table '$table' not found; have ${roots.keys.toSeq.sorted.mkString(", ")}"))
    db.scanTable(root)
  }
}
