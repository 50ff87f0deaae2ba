from __future__ import annotations

import pandas as pd
import pytest

from dataquality_box_spark.session import get_spark
from dataquality_box_spark.synth import gen_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dqx-tests", parallelism=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf() -> pd.DataFrame:
    return gen_transcripts(n_conversations=120, seed=42)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    from dataquality_box_spark.schema import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA).cache()
