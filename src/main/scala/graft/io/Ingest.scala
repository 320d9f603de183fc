package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** Driver-side ingest utilities — reference S1/S2 (SURVEY §2.1):
  * Zenodo record download (`src/utils/zenodo_client.py:13-60`,
  * `http_utils.py:6-37`) and folder-filtered zip extraction
  * (`file_utils.py:62-112`). These are not Spark operators (single
  * files over HTTP); they stage data for the distributed pipeline.
  * Unlike the reference's whole-body-in-memory download
  * (`http_utils.py:21-37`), the body streams straight to disk.
  */
object Ingest {

  val ZenodoApiBase = "https://zenodo.org/api/records"

  /** Record-metadata URL — `zenodo_client.py:18` shape. */
  def recordUrl(recordId: String): String = s"$ZenodoApiBase/$recordId"

  /** Resolve a file's download URL from record JSON — the reference
    * walks `files[]` for a matching `key` and takes `links.self`
    * (`zenodo_client.py:22-30`). Minimal JSON scan, no parser deps.
    */
  def findFileUrl(recordJson: String, fileName: String): Option[String] = {
    val keyIdx = recordJson.indexOf(s""""key": "$fileName"""")
    val keyIdx2 = if (keyIdx >= 0) keyIdx
      else recordJson.indexOf(s""""key":"$fileName"""")
    if (keyIdx2 < 0) None
    else {
      val selfIdx = recordJson.indexOf("\"self\"", keyIdx2)
      if (selfIdx < 0) None
      else {
        val start = recordJson.indexOf('"', recordJson.indexOf(':', selfIdx) + 1)
        val end = recordJson.indexOf('"', start + 1)
        if (start < 0 || end < 0) None
        else Some(recordJson.substring(start + 1, end))
      }
    }
  }

  /** Streamed download (S1). Returns the written path. */
  def downloadFile(url: String, targetDir: String, fileName: String): Path = {
    Files.createDirectories(Paths.get(targetDir))
    val target = Paths.get(targetDir, fileName)
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(target))
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $url")
    target
  }

  /** Fetch a Zenodo record's file (S1 end-to-end):
    * record JSON → resolve file URL → streamed download.
    */
  def downloadFromZenodo(recordId: String, fileName: String,
      targetDir: String): Path = {
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    val req = HttpRequest.newBuilder(URI.create(recordUrl(recordId))).GET().build()
    val json = client.send(req, HttpResponse.BodyHandlers.ofString()).body()
    val url = findFileUrl(json, fileName).getOrElse(
      sys.error(s"file $fileName not in record $recordId"))
    downloadFile(url, targetDir, fileName)
  }

  /** Folder-filtered zip extraction (S2): extract only members whose
    * path contains one of `folderNames` as a directory component
    * (`file_utils.py:62-112`); empty filter extracts everything.
    */
  def unzipFolders(zipPath: String, targetDir: String,
      folderNames: Seq[String] = Nil): Seq[Path] = {
    val zip = new ZipFile(zipPath)
    try {
      val extracted = zip.entries().asScala.filter { e =>
        !e.isDirectory && (folderNames.isEmpty ||
          e.getName.split("/").init.exists(folderNames.contains))
      }.map { e =>
        val out = Paths.get(targetDir, e.getName)
        // zip-slip guard: resolved path must stay under targetDir
        require(out.normalize().startsWith(Paths.get(targetDir).normalize()),
          s"zip entry escapes target dir: ${e.getName}")
        Files.createDirectories(out.getParent)
        val in = zip.getInputStream(e)
        val os = new BufferedOutputStream(new FileOutputStream(out.toFile))
        try in.transferTo(os) finally { os.close(); in.close() }
        out
      }.toSeq
      extracted
    } finally zip.close()
  }
}
