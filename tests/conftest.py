from __future__ import annotations

import pytest

from duplicate_finder_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dfs-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus():
    from duplicate_finder_spark.fixtures import generate_corpus
    return generate_corpus(n_pages=600, seed=42)


@pytest.fixture(scope="session")
def small_pages(spark, small_corpus):
    from duplicate_finder_spark.fixtures import corpus_to_spark
    pages, truth = corpus_to_spark(spark, small_corpus)
    pages = pages.cache()
    pages.count()
    return pages, truth
