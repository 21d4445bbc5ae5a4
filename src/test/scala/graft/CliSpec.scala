package graft

import graft.cli.CaipyToFiftyone
import graft.io.Caipy
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** The service-free caipy→fiftyone CLI (reference
  * lours/cli/caipy_to_fiftyone.py): initial conversion, the diff-driven
  * incremental update batches, and the debounced watch loop. */
class CliSpec extends SparkFunSuite {

  private def writeImg(root: String, split: String, id: Long, annId: Long,
      w: Int = 640, boxX: Double = 1.0): Unit = {
    Files.createDirectories(Paths.get(root, "Annotations", split))
    Files.writeString(Paths.get(root, "Annotations", split, s"img$id.json"),
      s"""{"image": {"id": $id, "file_name": "img$id.jpg", "width": $w, "height": 480},
         |  "annotations": [
         |    {"id": $annId, "image_id": $id, "category_id": 51, "category_str": "bowl",
         |     "bbox": [$boxX, 2.0, 30.0, 40.0]}]}""".stripMargin)
  }

  private def jsonlRows(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Nil
    import scala.jdk.CollectionConverters._
    Files.list(p).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .flatMap(f => Files.readAllLines(f).asScala)
      .filter(_.nonEmpty).toSeq
  }

  test("parseArgs covers the reference's surface; missing inputs fail") {
    val c = CaipyToFiftyone.parseArgs(Array(
      "--mode", "vanilla", "-i", "/tmp/x", "--out", "/tmp/o",
      "-s", "train", "valid", "--name", "demo", "--watch",
      "--cooldown-ms", "5", "--not-persistent", "--port", "5151"))
    assert(c.inputFolder.contains("/tmp/x") && c.watch && !c.persistent)
    assert(c.splitsToRead.contains(Seq("train", "valid")) && c.port == 5151)
    assert(c.annotationsDir == "/tmp/x/Annotations")
    intercept[IllegalArgumentException] {
      CaipyToFiftyone.parseArgs(Array("--mode", "generic", "--out", "/tmp/o"))
    }
    intercept[IllegalArgumentException] {
      CaipyToFiftyone.parseArgs(Array("-i", "/tmp/x")) // no --out
    }
  }

  test("convert writes the full sample JSONL + meta; splits default to all on disk") {
    val root = Files.createTempDirectory("cli_caipy").toString
    writeImg(root, "train", 9, 1)
    writeImg(root, "valid", 12, 2)
    val out = Files.createTempDirectory("cli_out").toString
    val c = CaipyToFiftyone.parseArgs(Array("-i", root, "--out", out, "-n", "demo"))
    val ds = CaipyToFiftyone.load(spark, c)
    assert(ds.numImages == 2) // no -s → both split dirs discovered
    CaipyToFiftyone.convert(ds, c)
    val rows = jsonlRows(s"$out/current")
    assert(rows.size == 2 && rows.forall(_.contains("lours_id")))
    assert(Files.readString(Paths.get(out, "meta.json")).contains("\"demo\""))
  }

  test("applyUpdate emits upserts for new+changed images and removals for deleted ones") {
    val root = Files.createTempDirectory("cli_upd").toString
    writeImg(root, "train", 9, 1)
    writeImg(root, "valid", 12, 2)
    val out = Files.createTempDirectory("cli_upd_out").toString
    val c = CaipyToFiftyone.parseArgs(Array("-i", root, "--out", out))
    val old = CaipyToFiftyone.load(spark, c)
    old.images.count(); old.annotations.count()

    writeImg(root, "train", 9, 1, boxX = 99.0) // changed annotation → image 9
    writeImg(root, "train", 20, 3) // new image
    Files.delete(Paths.get(root, "Annotations", "valid", "img12.json")) // removed

    val (fresh, nUp, nRm) = CaipyToFiftyone.applyUpdate(spark, c, old, batch = 0)
    assert(nUp == 2 && nRm == 1)
    assert(fresh.numImages == 2)
    val upserts = jsonlRows(s"$out/updates/batch_00000")
    assert(upserts.size == 2)
    assert(upserts.exists(_.contains("img20.jpg")) && upserts.exists(_.contains("img9.jpg")))
    assert(Files.readString(Paths.get(out, "removed", "batch_00000.json")) == "[12]")
    // current/ reflects the fresh tree
    assert(jsonlRows(s"$out/current").size == 2)
  }

  test("applyUpdate with no changes is an empty batch") {
    val root = Files.createTempDirectory("cli_noop").toString
    writeImg(root, "train", 9, 1)
    val out = Files.createTempDirectory("cli_noop_out").toString
    val c = CaipyToFiftyone.parseArgs(Array("-i", root, "--out", out))
    val old = CaipyToFiftyone.load(spark, c)
    val (_, nUp, nRm) = CaipyToFiftyone.applyUpdate(spark, c, old, batch = 0)
    assert(nUp == 0 && nRm == 0)
    assert(Files.readString(Paths.get(out, "removed", "batch_00000.json")) == "[]")
  }

  test("watchLoop debounces a burst of writes into one update batch") {
    val root = Files.createTempDirectory("cli_watch").toString
    writeImg(root, "train", 9, 1)
    val out = Files.createTempDirectory("cli_watch_out").toString
    val c = CaipyToFiftyone.parseArgs(Array("-i", root, "--out", out,
      "--watch", "--cooldown-ms", "1500", "--max-updates", "1"))
    val initial = CaipyToFiftyone.load(spark, c)
    initial.images.count()
    val t = new Thread(() => CaipyToFiftyone.watchLoop(spark, c, initial))
    t.setDaemon(true)
    t.start()
    Thread.sleep(500) // let the watcher register
    // burst: two files land inside the cooldown → ONE batch covers both
    writeImg(root, "train", 21, 4)
    Thread.sleep(100)
    writeImg(root, "train", 22, 5)
    t.join(60000)
    assert(!t.isAlive, "watch loop did not complete its bounded update")
    assert(jsonlRows(s"$out/updates/batch_00000").size == 2)
    assert(!Files.isDirectory(Paths.get(out, "updates", "batch_00001")))
  }

  test("watchLoop registers a nested subdir created mid-watch and sees its files") {
    val root = Files.createTempDirectory("cli_nest").toString
    writeImg(root, "train", 9, 1)
    val out = Files.createTempDirectory("cli_nest_out").toString
    val c = CaipyToFiftyone.parseArgs(Array("-i", root, "--out", out,
      "--watch", "--cooldown-ms", "800", "--max-updates", "2"))
    val initial = CaipyToFiftyone.load(spark, c)
    initial.images.count()
    val t = new Thread(() => CaipyToFiftyone.watchLoop(spark, c, initial))
    t.setDaemon(true)
    t.start()
    Thread.sleep(500) // let the watcher register
    // batch 0: a subdirectory appears under train/ with a nested JSON
    // (reference trees keep per-image subdirs, caipy.py:464-492); the
    // drain must register the NEW dir itself (event context is relative
    // to the key's dir, not the annotations root)
    val sub = Paths.get(root, "Annotations", "train", "cam0")
    Files.createDirectories(sub)
    Files.writeString(sub.resolve("img30.json"),
      """{"image": {"id": 30, "file_name": "cam0/img30.jpg", "width": 640, "height": 480},
        |  "annotations": []}""".stripMargin)
    // wait for batch 0's CONTENT (not just the directory — writeJsonl
    // creates the dir before the Spark job finishes writing) so the second
    // write can't be coalesced into the first batch
    val deadline = System.currentTimeMillis() + 30000
    def batch0HasImg30 = jsonlRows(s"$out/updates/batch_00000").exists(_.contains("img30"))
    while (!batch0HasImg30 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(batch0HasImg30)
    // batch 1: a file INSIDE the mid-watch-created subdir must still wake
    // the watcher — this only works if cam0/ got registered during drain
    Thread.sleep(200)
    Files.writeString(sub.resolve("img31.json"),
      """{"image": {"id": 31, "file_name": "cam0/img31.jpg", "width": 640, "height": 480},
        |  "annotations": []}""".stripMargin)
    t.join(60000)
    assert(!t.isAlive, "watch loop never saw the nested-dir file: cam0/ was not registered")
    assert(jsonlRows(s"$out/updates/batch_00001").exists(_.contains("img31")))
  }

  test("watchLoop survives a transiently empty tree and retries on the next change") {
    val root = Files.createTempDirectory("cli_resil").toString
    writeImg(root, "train", 9, 1)
    val out = Files.createTempDirectory("cli_resil_out").toString
    val c = CaipyToFiftyone.parseArgs(Array("-i", root, "--out", out,
      "--watch", "--cooldown-ms", "400", "--max-updates", "1"))
    val initial = CaipyToFiftyone.load(spark, c)
    initial.images.count()
    val t = new Thread(() => CaipyToFiftyone.watchLoop(spark, c, initial))
    t.setDaemon(true)
    t.start()
    Thread.sleep(500) // let the watcher register
    // the tree goes briefly empty: the triggered reload fails (no split dir
    // holds any JSON) — the watcher must log and stay alive, not die
    Files.delete(Paths.get(root, "Annotations", "train", "img9.json"))
    Thread.sleep(4000) // let the failing reload run its course
    assert(t.isAlive, "watch loop died on the transiently empty tree")
    // the tree comes back with different content; the retry diffs against
    // the KEPT pre-failure state: img40 new, img9 removed, one batch
    writeImg(root, "train", 40, 7)
    t.join(60000)
    assert(!t.isAlive, "watch loop never recovered after the failed reload")
    assert(jsonlRows(s"$out/updates/batch_00000").exists(_.contains("img40")))
    assert(Files.readString(Paths.get(out, "removed", "batch_00000.json")) == "[9]")
  }

  test("fromAnnotationsRoot loads a detached annotations tree with its own images root") {
    val root = Files.createTempDirectory("cli_gen").toString
    writeImg(root, "train", 9, 1)
    val ds = Caipy.fromAnnotationsRoot(spark, s"$root/Annotations",
      imagesRoot = "/data/imgs", splits = Seq("train"))
    assert(ds.numImages == 1 && ds.imagesRoot == "/data/imgs")
    val cli = CaipyToFiftyone.load(spark, CaipyToFiftyone.parseArgs(Array(
      "--mode", "generic", "--ir", "/data/imgs", "--ar", s"$root/Annotations",
      "--out", "/tmp/unused_gen")))
    assert(cli.numImages == 1 && cli.imagesRoot == "/data/imgs")
    assert(collectSorted(cli.annotations.select("id", "image_id")) ==
      collectSorted(ds.annotations.select("id", "image_id")))
  }

  test("flat generic mode SETS the images root; filepaths resolve into it") {
    // a FLAT annotations folder (no split subdirs) → the CaipyGeneric
    // dialect; --ir must become the root VERBATIM with relative paths
    // untouched (a re-anchor would rewrite them to "../<annDir>/...",
    // keeping every filepath pointing into the annotations folder)
    val flat = Files.createTempDirectory("cli_flat").toString
    Files.writeString(Paths.get(flat, "img7.json"),
      """{"image": {"id": 7, "file_name": "img7.jpg", "width": 640, "height": 480},
        |  "annotations": [
        |    {"id": 1, "image_id": 7, "category_id": 51, "category_str": "bowl",
        |     "bbox": [1.0, 2.0, 30.0, 40.0]}]}""".stripMargin)
    val cli = CaipyToFiftyone.load(spark, CaipyToFiftyone.parseArgs(Array(
      "--mode", "generic", "--ir", "/data/pictures", "--ar", flat,
      "--out", "/tmp/unused_flat")))
    assert(cli.imagesRoot == "/data/pictures")
    val rel = cli.images.select("relative_path").head().getString(0)
    assert(rel == "img7.jpg", s"relative_path re-anchored: $rel")
  }

  test("meta.json survives a dataset name needing JSON escaping") {
    val root = Files.createTempDirectory("cli_esc").toString
    writeImg(root, "train", 1, 1)
    val out = Files.createTempDirectory("cli_esc_out").toString
    val c = CaipyToFiftyone.parseArgs(Array("-i", root, "-o", out,
      "--name", "my\"weird\\name"))
    CaipyToFiftyone.convert(CaipyToFiftyone.load(spark, c), c)
    val txt = Files.readString(Paths.get(out, "meta.json"))
    // must parse as JSON and round-trip the name
    val parsed = spark.range(1).select(
      from_json(lit(txt), org.apache.spark.sql.types.StructType.fromDDL(
        "dataset_name STRING, persistent BOOLEAN"))
        .getField("dataset_name")).head().getString(0)
    assert(parsed == "my\"weird\\name")
  }
}
