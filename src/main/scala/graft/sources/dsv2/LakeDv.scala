package graft.sources.dsv2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Deletion-vector sidecar codec: one small JSON file per
  * (commit, data file) listing the FILE-RELATIVE row positions a
  * merge-on-read DELETE/MERGE removed — `{"file": <dataFile>,
  * "positions": [..]}` under a `dv-<uuid>.dv.json` name in the table
  * directory. The manifest's `dvs` map (data file → DV sidecars) is
  * the only association; names carry no meaning.
  *
  * Readers subtract the UNION of a file's DV position sets; positions
  * are sorted so the scan applies them with a single advancing cursor
  * (O(1) per row, no per-row set lookup).
  *
  * Scale note: a production port swaps the JSON array for a roaring
  * bitmap (Delta's DV format) — the contract (per-file position sets,
  * manifest association, complete-set semantics per version) is
  * unchanged; JSON keeps this implementation dependency-free and
  * human-inspectable.
  */
object LakeDv {
  private val mapper = new ObjectMapper()

  /** Write one DV sidecar for `dataFile`; returns the sidecar name. */
  def write(dir: String, dataFile: String, positions: Seq[Long]): String = {
    require(positions.nonEmpty, s"empty deletion vector for $dataFile")
    val name = s"dv-${java.util.UUID.randomUUID()}.dv.json"
    val fs = new Path(dir).getFileSystem(new Configuration())
    val body = new java.util.HashMap[String, Object]()
    body.put("file", dataFile)
    val arr = new java.util.ArrayList[java.lang.Long](positions.size)
    positions.sorted.foreach(p => arr.add(java.lang.Long.valueOf(p)))
    body.put("positions", arr)
    val out = fs.create(new Path(dir, name), false)
    try out.write(mapper.writeValueAsBytes(body)) finally out.close()
    name
  }

  /** Sorted union of the position sets in `dvFiles` (a data file's DV
    * list from the manifest). Driver- or executor-side metadata read;
    * size ∝ deleted rows of ONE file.
    */
  def positions(dir: String, dvFiles: Seq[String]): Array[Long] = {
    if (dvFiles.isEmpty) return Array.empty
    val fs = new Path(dir).getFileSystem(new Configuration())
    val all = dvFiles.flatMap { f =>
      val in = fs.open(new Path(dir, f))
      val bytes = try in.readAllBytes() finally in.close()
      val body = mapper.readValue(bytes,
        classOf[java.util.Map[String, Object]])
      body.get("positions").asInstanceOf[java.util.List[Number]]
        .toArray(Array.empty[Number]).map(_.longValue()).toSeq
    }
    all.distinct.sorted.toArray
  }
}
