
import shutil
from belb_spark.session import get_spark
spark = get_spark("lab_bucket_prep", master="local[16]", shuffle_partitions=48,
                  extra_conf={"spark.sql.warehouse.dir": "/tmp/belb_lab_wh"})
spark.sparkContext.setLogLevel("ERROR")
shutil.rmtree('/tmp/belb_lab_ckpt_xxl' + "/pairs_h_bucketed", ignore_errors=True)
spark.sql("DROP TABLE IF EXISTS lab_pairs_hb_w")
(spark.read.parquet('/tmp/belb_lab_ckpt_xxl' + "/pairs_h")
 .write.bucketBy(48, "h_a", "h_b")
 .option("path", '/tmp/belb_lab_ckpt_xxl' + "/pairs_h_bucketed")
 .saveAsTable("lab_pairs_hb_w"))
print("BUCKET PREP DONE")
