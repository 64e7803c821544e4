import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from gitlab_elasticsearch_indexer_spark.operators import index_build as ib
from gitlab_elasticsearch_indexer_spark.operators import pipeline as pl
from gitlab_elasticsearch_indexer_spark.session import get_spark

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n = sys.argv[2] if len(sys.argv) > 2 else "100000"
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
src = spark.read.parquet(f"/root/repo/.cache/fixtures_{n}")

t0 = time.time()
docs = pl.run_blob_pipeline(spark, src)
docs.persist().count()
t1 = time.time()
print(f"PHASE pipeline {t1-t0:.1f}", flush=True)

d = docs.select("id", "content", F.col("rid").alias("repo"), "path",
                F.col("language").alias("lang"))
wi = ib.assign_doc_ids(d)
wi.persist().count()
t2 = time.time()
print(f"PHASE assign_ids {t2-t1:.1f}", flush=True)

dpp = 1563
ds = ib.doc_stats_from_docs(wi, "code", dpp).persist()
avgdl = ds.agg(F.avg("dl")).collect()[0][0]
t3 = time.time()
print(f"PHASE doc_stats {t3-t2:.1f}", flush=True)

post = ib.postings_from_docs(wi, "code", dpp)
post.write.mode("overwrite").parquet("/root/repo/.cache/_prof_postings")
t4 = time.time()
print(f"PHASE postings_pack_write {t4-t3:.1f}", flush=True)

ts = ib.term_stats_from_postings(
    spark.read.parquet("/root/repo/.cache/_prof_postings"), 100000)
ts.count()
t5 = time.time()
print(f"PHASE term_stats {t5-t4:.1f}", flush=True)
print(f"TOTAL {t5-t0:.1f}", flush=True)
