"""Compaction operator test: many small files -> few, content preserved."""

from __future__ import annotations

from etl_docker_spark.operators.compact import compact_table, table_file_stats


def test_compact_preserves_content(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # 40 tiny appends -> 40+ data files (streaming-writer pathology)
    for i in range(40):
        spark.range(i * 10, i * 10 + 10).write.mode("append").parquet(path)
    before_files, _ = table_file_stats(path)
    assert before_files >= 40
    checksum_before = spark.read.parquet(path).selectExpr("sum(id)").first()[0]

    b, a = compact_table(spark, path)
    assert b == before_files and a < b and a <= 4
    assert spark.read.parquet(path).selectExpr("sum(id)").first()[0] == checksum_before
    assert spark.read.parquet(path).count() == 400
