"""spark-submit entry point demonstrating --py-files shipping.

    cd /root/repo && zip -qr /tmp/mdbloom.zip mdbloom
    spark-submit --master local[4] --py-files /tmp/mdbloom.zip \
        scripts/submit_demo.py /tmp/mdbloom_submit_idx

Builds a small transcript index and runs one verified membership query —
exercising every executor-side import path from the shipped zip.
"""

import sys

from pyspark.sql import SparkSession


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdbloom_submit_idx"
    spark = (SparkSession.builder.appName("mdbloom-submit-demo")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    from mdbloom.spark.build import BloomIndexWriter, IndexConfig
    from mdbloom.spark.query import BloomIndexReader
    from mdbloom.spark.transcripts import synthesize_transcripts

    df = synthesize_transcripts(spark, 2000, seed=42)
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=4,
                      chunk_slots=1024)
    stats = BloomIndexWriter(spark, cfg).build(df, out)
    r = BloomIndexReader(spark, out)
    toks = r.transcript_query_tokens("assistant", None, ["w00001"])
    n = r.search_verified(toks, df).count()
    print(f"SUBMIT_DEMO_OK rows={stats['rows']} verified_hits={n}")
    spark.stop()


if __name__ == "__main__":
    main()
