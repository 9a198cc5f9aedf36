package graft.pipeline

import java.io.FileOutputStream
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream
import scala.collection.mutable.ListBuffer

/** The extract stage (reference S2: `unzip -o` subprocess,
  * extract.go:56-63) — driver-side I/O, no Spark involvement: unpack the
  * weekly archive into the staging dir that ingestion scans. The SFTP
  * download itself (S1) stays outside the engine (environment I/O); the
  * pipeline's contract starts at a local archive or staging dir.
  */
object Extract {

  /** Unzip `zipFile` into `destDir` (flat, overwrite like `unzip -o`);
    * returns extracted file names. Entries with path components are
    * flattened to their base name — staging is a flat dir
    * (load.go:40 reads it non-recursively), and this also neutralizes
    * zip-slip paths.
    */
  def unzip(zipFile: String, destDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(destDir))
    val out = ListBuffer.empty[String]
    val zin = new ZipInputStream(Files.newInputStream(Paths.get(zipFile)))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val name = Paths.get(e.getName).getFileName.toString
          val dest = Paths.get(destDir, name)
          val fos = new FileOutputStream(dest.toFile)
          try zin.transferTo(fos) finally fos.close()
          out += name
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }
}
