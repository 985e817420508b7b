import sys

import pytest

sys.path.insert(0, "/root/repo")

from typical_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("typical-spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from typical_spark.sources.transcripts import generate_transcripts_pdf

    return generate_transcripts_pdf(5000, seed=42)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf).cache()
