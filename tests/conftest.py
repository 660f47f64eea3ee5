from __future__ import annotations

import pandas as pd
import pytest

from log_parser_spark import datagen
from log_parser_spark.session import get_spark

TEST_SF = 0.001  # ~10k rows


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app_name="tokenlog-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def dataset_dir():
    return datagen.ensure_dataset(TEST_SF)


@pytest.fixture(scope="session")
def truth(dataset_dir) -> pd.DataFrame:
    return pd.read_parquet(dataset_dir / "truth.parquet")


@pytest.fixture(scope="session")
def raw_lines(dataset_dir) -> pd.DataFrame:
    return pd.read_parquet(dataset_dir / "raw_lines.parquet")


@pytest.fixture(scope="session")
def token_df(spark, dataset_dir):
    from log_parser_spark.sources.token_table import read_token_sequences

    return read_token_sequences(spark, dataset_dir)


@pytest.fixture(scope="session")
def classified(token_df):
    from log_parser_spark.operators.parse import classify, with_line

    df = classify(with_line(token_df)).persist()
    df.count()
    return df
