package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratchpad for driving entry points interactively via sbt. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg")
    val f = dir.resolve("config.json")
    java.nio.file.Files.writeString(f,
      """{"function_type": "sine", "n_train": 123, "n_val": 7, "seq_len": 32,
        | "epochs": 2, "timesteps": 50, "beta_schedule": "cosine", "loss_type": "mse"}""".stripMargin)
    println("FILE CONTENT:")
    println(java.nio.file.Files.readString(f))
    val df = spark.read.option("multiLine", true).json(f.toString)
    df.printSchema()
    df.show(false)
    spark.stop()
  }
}
