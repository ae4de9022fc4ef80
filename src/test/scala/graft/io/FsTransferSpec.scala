package graft.io

import org.scalatest.funsuite.AnyFunSuite

class FsTransferSpec extends AnyFunSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("upload/download round-trip through the FS connector (A11/A12)") {
    val dir = tmp("fs")
    val src = s"$dir/src.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src), "{\"a\":1}\n")
    assert(FsTransfer.upload(src, s"file://$dir/remote/obj.json"))
    assert(FsTransfer.exists(s"file://$dir/remote/obj.json"))
    assert(FsTransfer.download(s"file://$dir/remote/obj.json", s"$dir/back.json"))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/back.json"))
      === "{\"a\":1}\n")
  }

  test("missing source/object returns false, mirroring the 404 path") {
    val dir = tmp("fs404")
    assert(!FsTransfer.upload(s"$dir/nope.json", s"file://$dir/x"))
    assert(!FsTransfer.download(s"file://$dir/nope.json", s"$dir/y"))
    assert(!FsTransfer.exists(s"file://$dir/nope.json"))
  }

  test("copyTree publishes a directory recursively") {
    val dir = tmp("fstree")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/sub"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in/sub/f.txt"), "x")
    assert(FsTransfer.copyTree(s"file://$dir/in", s"file://$dir/out"))
    assert(FsTransfer.exists(s"file://$dir/out/sub/f.txt"))
  }
}
