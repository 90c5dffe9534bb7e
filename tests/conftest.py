from __future__ import annotations

import pytest

from bitcoin_ledger_2es_spark.session import get_spark
from bitcoin_ledger_2es_spark.sources.synth import gen_transcripts_pdf


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pdf():
    return gen_transcripts_pdf(n_conv=200, seed=42)


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_pdf):
    from bitcoin_ledger_2es_spark.sources.synth import TRANSCRIPTS_DDL

    return spark.createDataFrame(tiny_pdf, schema=TRANSCRIPTS_DDL).cache()
