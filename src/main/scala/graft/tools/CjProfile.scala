package graft.tools
import java.nio.file.{Files, Paths}
object CjProfile {
  def main(args: Array[String]): Unit = {
    val json = Files.readString(Paths.get("/root/reference/examples/DenHaag_01.city.json"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    (1 to 3).foreach { _ => mapper.readTree(json); graft.cj.CjConvert.convert("w", json) }
    var t0 = System.nanoTime()
    (1 to 10).foreach(_ => mapper.readTree(json))
    println(f"parse only: ${(System.nanoTime()-t0)/1e10}%.3f s/doc")
    t0 = System.nanoTime()
    (1 to 10).foreach(_ => graft.cj.CjConvert.convert("d", json))
    println(f"full convert: ${(System.nanoTime()-t0)/1e10}%.3f s/doc")
  }
}
