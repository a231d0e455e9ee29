from __future__ import annotations

import pandas as pd
import pytest

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from text_extraction_evaluation_spark.sources.readers import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF0001}/documents.parquet")
