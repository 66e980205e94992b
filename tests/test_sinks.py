"""Cell-prefix-partitioned sink: layout, pruning, row fidelity."""

from pyspark.sql import functions as F

from segment_rtree_spark.sinks import read_images_partitioned, write_images_partitioned
from segment_rtree_spark.synth import images_df_fast
from segment_rtree_spark.tiles import cell_of_sql, cell_prefix_sql


def test_partitioned_write_roundtrip_and_pruning(spark, tmp_path):
    imgs = images_df_fast(spark, 4000).cache()
    path = str(tmp_path / "img_tbl")
    write_images_partitioned(imgs, path, res=10, prefix_bits=4)

    back = read_images_partitioned(spark, path)
    assert back.count() == 4000
    # captions survive the partitioned write byte-identical
    a = {r["image_id"]: r["caption"] for r in imgs.select("image_id", "caption").collect()}
    b = {r["image_id"]: r["caption"] for r in back.select("image_id", "caption").collect()}
    assert a == b

    # a cell_p predicate prunes at the file-source partition level
    one = back.select("cell_p").first()["cell_p"]
    plan = back.filter(F.col("cell_p") == one)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "cell_p" in plan
    # prefix is consistent with the cell column
    chk = back.withColumn(
        "cp2", F.expr(cell_prefix_sql("cell", 4))
    ).filter(F.col("cp2") != F.col("cell_p"))
    assert chk.count() == 0
