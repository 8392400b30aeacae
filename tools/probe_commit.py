"""Diagnose the serial term inside the timed extraction phase.

The scaling attempts show T(p) ~= S + W/p with S ~= 4-5 s: a constant,
parallelism-independent cost inside `extracted.write.partitionBy("bucket")`
(lineage.py run_resumable). Candidates: the dynamic-partition-overwrite
commit (driver-side staging moves of ~n_buckets*salt files), job/stage
scheduling, Python worker spin-up. This probe times the identical write at
one parallelism level under commit-protocol variants to attribute S.

Usage: taskset -c 0-7 python tools/probe_commit.py 8 [variant ...]
Variants: dyn (status quo), static (non-dynamic overwrite),
v2 (fileoutputcommitter algorithm 2), dyn_v2.
"""
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = "/dev/shm/scalebench/corpus.parquet"
OUT = "/dev/shm/scalebench/probe_out"


def run(cores: int, variant: str, trials: int = 3) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdf_extraction_spark.lineage import bucket_col
    from pdf_extraction_spark.pipeline import extract_corpus

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"probe_{variant}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/scalebench/spark-local")
        .config("spark.ui.enabled", "false")
    )
    if "v2" in variant:
        b = b.config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if variant.startswith("dyn"):
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    corpus = spark.read.parquet(CORPUS)
    tagged = corpus.withColumn("bucket", bucket_col(64))
    extracted = extract_corpus(
        tagged.select("url", "html", "bucket"),
        partitions=cores * 3,
        keep_cols=("bucket",),
        partition_exprs=[
            F.col("bucket"), F.pmod(F.xxhash64(F.col("url")), F.lit(8)),
        ],
    )
    for t in range(trials):
        shutil.rmtree(OUT, ignore_errors=True)
        t0 = time.monotonic()
        extracted.write.mode("overwrite").partitionBy("bucket").parquet(OUT)
        w = time.monotonic() - t0
        # second timing: count-only action on the same plan = everything
        # except the sink encode+commit
        t0 = time.monotonic()
        n = extracted.selectExpr("count(*)").collect()  # noqa: F841
        c = time.monotonic() - t0
        print(
            f"variant={variant} cores={cores} trial={t} "
            f"write_s={w:.2f} countonly_s={c:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    cores = int(sys.argv[1])
    variants = sys.argv[2:] or ["dyn", "static", "dyn_v2"]
    for v in variants:
        run(cores, v)
