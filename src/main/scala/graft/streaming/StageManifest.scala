package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}

/** Minimal per-partition commit manifest — the table-format kernel that
  * makes compaction ATOMIC on a plain filesystem (the round-1 compactor's
  * documented add-then-delete crash window, now closed).
  *
  * A day partition may carry `_retired.json` holding two sets of leaf
  * names (`batch_id=*` dirs or legacy loose files):
  *
  *   - `retired`: ingest leaves REPLACED by compaction — readers skip them
  *     even while they still exist (deletes are lazy);
  *   - `live`: compacted leaves readers may include — a compacted leaf NOT
  *     in this set is invisible, even though it already sits in the
  *     directory.
  *
  * Visibility rule (StreamingIngest.stageTable): ingest leaves
  * (`batch_id=<n>`) count unless retired; compacted leaves
  * (`batch_id=compacted-*`) count only while listed live. So the single
  * atomic manifest rename flips a partition from "originals" to
  * "compacted" — there is no instant at which both are visible:
  *
  *   crash before the commit → compacted leaf exists but is not live →
  *     readers see exactly the originals;
  *   crash after the commit, before the lazy deletes → originals exist
  *     but are retired → readers see exactly the compacted leaf.
  *
  * Consequence: the stage zone must be read through `stageTable` (the
  * engine's catalog entry point), exactly as any table format requires
  * readers to honor its manifest rather than `ls`.
  *
  * Format: `{"retired":[…],"live":[…]}`. Replacement protocol (Hadoop
  * rename does not overwrite, so replace = write-temp / delete / rename,
  * and the delete→rename gap must not strand readers): readers that find
  * no `_retired.json` fall back to the temp file. The temp always holds
  * the NEXT manifest (it is fully written and flushed before the delete),
  * so every crash/race point resolves to a consistent view — old manifest
  * while the target still exists, new manifest (via temp) in the gap,
  * new manifest after the rename.
  */
object StageManifest {
  val ManifestName = "_retired.json"
  private val TempName = s".$ManifestName.tmp"

  final case class Manifest(retired: Set[String], live: Set[String]) {
    /** Leaf visibility under this manifest. */
    def includes(leafName: String): Boolean =
      if (leafName.startsWith("batch_id=compacted-")) live.contains(leafName)
      else !retired.contains(leafName)
  }
  val Empty: Manifest = Manifest(Set.empty, Set.empty)

  private def readFile(fs: FileSystem, f: Path): Option[Manifest] =
    try {
      val in = fs.open(f)
      val bytes = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        out.toByteArray
      } finally in.close()
      Some(parse(new String(bytes, StandardCharsets.UTF_8)))
    } catch {
      case _: java.io.FileNotFoundException => None
    }

  /** Current manifest: the committed file, else the temp fallback (the
    * delete→rename gap of a replacement, or a crash inside it), else
    * empty. Open-then-catch, not exists-then-open, so a racing replace
    * cannot strand the reader between the two calls. */
  def read(fs: FileSystem, partitionDir: Path): Manifest =
    readFile(fs, new Path(partitionDir, ManifestName))
      .orElse(readFile(fs, new Path(partitionDir, TempName)))
      .getOrElse(Empty)

  /** Publish a compaction: `replaced` leaves leave the visible set,
    * `compacted` enters it. Entries for leaves that no longer exist are
    * pruned so the manifest stays O(live leaves). Crash-safe per the
    * replacement protocol above. */
  def commit(fs: FileSystem, partitionDir: Path,
      replaced: Set[String], compacted: String): Unit = {
    val prev = read(fs, partitionDir)
    val next = Manifest(
      retired = (prev.retired ++ replaced - compacted)
        .filter(n => fs.exists(new Path(partitionDir, n))),
      live = (prev.live -- replaced) + compacted)
    val tmp = new Path(partitionDir, TempName)
    val out = fs.create(tmp, true)
    try out.write(render(next).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(partitionDir, ManifestName)
    if (fs.exists(target)) require(fs.delete(target, false),
      s"replacing $target: delete failed")
    require(fs.rename(tmp, target), s"manifest commit $tmp -> $target failed")
  }

  private def esc(n: String): String =
    "\"" + n.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def render(m: Manifest): String =
    s"""{"retired":${m.retired.toSeq.sorted.map(esc).mkString("[", ",", "]")},""" +
      s""""live":${m.live.toSeq.sorted.map(esc).mkString("[", ",", "]")}}"""

  private def parseArr(body: String): Set[String] =
    if (body.trim.isEmpty) Set.empty
    else body.trim.split("\",\\s*\"").map(_.stripPrefix("\"").stripSuffix("\"")
      .replace("\\\"", "\"").replace("\\\\", "\\")).toSet

  private def parse(s: String): Manifest = {
    // strict subset of JSON we produce; arrays hold path segments
    def arr(key: String): Set[String] = {
      val m = ("\"" + key + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(s)
      m.map(g => parseArr(g.group(1))).getOrElse(Set.empty)
    }
    Manifest(arr("retired"), arr("live"))
  }
}
