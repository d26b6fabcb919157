package graft.tools
object GifDump {
  def main(args: Array[String]): Unit = {
    for (id <- Seq(0L, 7L, 123L, 4242L)) {
      val w = 8 + (id % 16).toInt * 4
      val h = 8 + (id % 12).toInt * 4
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/test_$id.gif"),
        graft.operators.Gif.buildGif(id, w, h))
    }
    // a big one that forces dictionary resets
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/test_big.gif"),
      graft.operators.Gif.buildGif(99L, 68, 52))
    println("dumped")
  }
}
