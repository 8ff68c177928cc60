from __future__ import annotations

import pytest

from search_engine_core_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_corpus(spark):
    from search_engine_core_spark.corpus import synthesize_corpus, with_doc_columns

    return with_doc_columns(synthesize_corpus(spark, n_docs=120, tokens_per_doc=80)).cache()
