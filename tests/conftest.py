from __future__ import annotations

import pytest

from solr_indexing_spark.session import get_spark
from solr_indexing_spark.synth import gen_pages


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    return gen_pages(500, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf, tmp_path_factory):
    from solr_indexing_spark.synth import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages_parquet(path, 500, seed=42)
    return spark.read.parquet(path)
