package graft.io

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

class IngestSpec extends AnyFunSuite {

  test("zenodo record URL + file URL resolution from record JSON") {
    assert(Ingest.recordUrl("3887306") ===
      "https://zenodo.org/api/records/3887306")
    val json =
      """{"files": [
        |  {"key": "other.zip", "links": {"self": "https://zenodo.org/x/other.zip"}},
        |  {"key": "data.zip", "links": {"self": "https://zenodo.org/x/data.zip"}}
        |]}""".stripMargin
    assert(Ingest.findFileUrl(json, "data.zip") ===
      Some("https://zenodo.org/x/data.zip"))
    assert(Ingest.findFileUrl(json, "missing.zip") === None)
  }

  private def makeZip(dir: String): String = {
    val zipPath = s"$dir/fixture.zip"
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipPath))
    def add(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes)
      zos.closeEntry()
    }
    add("data/raw/a.csv", "x,y\n1,2")
    add("data/raw/b.csv", "x,y\n3,4")
    add("data/weather/w.csv", "t,c\n5,6")
    add("docs/readme.txt", "hi")
    zos.close()
    zipPath
  }

  test("unzipFolders extracts only matching folders") {
    val dir = Files.createTempDirectory("ingest").toString
    val zip = makeZip(dir)
    val out = Ingest.unzipFolders(zip, s"$dir/out", Seq("raw"))
    assert(out.map(_.getFileName.toString).sorted === Seq("a.csv", "b.csv"))
    assert(Files.readString(Paths.get(s"$dir/out/data/raw/a.csv")) === "x,y\n1,2")
    assert(!Files.exists(Paths.get(s"$dir/out/data/weather/w.csv")))
  }

  test("unzipFolders with empty filter extracts everything") {
    val dir = Files.createTempDirectory("ingest2").toString
    val zip = makeZip(dir)
    val out = Ingest.unzipFolders(zip, s"$dir/out")
    assert(out.size === 4)
  }

  test("zip-slip entries are rejected") {
    val dir = Files.createTempDirectory("ingest3").toString
    val zipPath = s"$dir/evil.zip"
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new ZipEntry("../escape.txt"))
    zos.write("pwn".getBytes)
    zos.closeEntry()
    zos.close()
    intercept[IllegalArgumentException] {
      Ingest.unzipFolders(zipPath, s"$dir/out")
    }
  }
}
