"""Partitioned parquet sink round-trips (sources/readers.write_partitioned)."""

import os

import pyarrow as pa
import pytest  # noqa: F401


class TestWritePartitioned:
    def test_plain_multi_file(self, ray_session, tmp_path):
        import ray.data as rd

        from record_matcher_ray.sources.readers import write_partitioned

        ds = rd.from_arrow(pa.table(
            {"k": list(range(1000)), "v": [i * 2 for i in range(1000)]}
        )).repartition(4)
        out = str(tmp_path / "plain")
        write_partitioned(ds, out, min_rows_per_file=100)
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert len(files) >= 2  # never one giant file
        back = rd.read_parquet(out).to_pandas().sort_values("k")
        assert back["v"].tolist() == [i * 2 for i in range(1000)]

    def test_partition_cols_prunes(self, ray_session, tmp_path):
        import ray.data as rd

        from record_matcher_ray.sources.readers import write_partitioned

        ds = rd.from_arrow(pa.table({
            "lang": ["en"] * 6 + ["de"] * 4,
            "doc_id": list(range(10)),
        }))
        out = str(tmp_path / "bylang")
        write_partitioned(ds, out, partition_cols=["lang"])
        # hive-style layout: one directory per partition value
        assert sorted(d for d in os.listdir(out) if "=" in d) == [
            "lang=de", "lang=en"]
        # a reader pointed at one partition sees only that slice
        only_de = rd.read_parquet(f"{out}/lang=de").to_pandas()
        assert sorted(only_de["doc_id"]) == [6, 7, 8, 9]
